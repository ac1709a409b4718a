"""In-framework word-embedding LM tests (models/prosody/lm.py).

The reference uses BERT-class word embeddings for prosody prediction and the
lm_feat conditioning (nlp/prosody_prediction/models/prosody_model.py:24,
tts_text_processors.py:895); offline, the framework trains skip-gram
embeddings on the corpus. These tests verify the distributional property
(words sharing contexts embed closer than unrelated words), persistence, the
OOV path, and the lm_feat handler integration.
"""

import numpy as np
import pytest

from speechflow_tpu.models.prosody.lm import WordLM, tokenize_words, train_word_lm


def _synthetic_corpus(n=400, seed=0):
    """Two topic clusters with interchangeable words: {cat, dog} appear in one
    context frame, {red, blue} in another."""
    rng = np.random.default_rng(seed)
    animals, colors = ["cat", "dog"], ["red", "blue"]
    texts = []
    for _ in range(n):
        a = animals[rng.integers(2)]
        c = colors[rng.integers(2)]
        texts.append(f"the {a} chased the ball quickly")
        texts.append(f"a bright {c} wall stood there")
    return texts


@pytest.fixture(scope="module")
def lm():
    return train_word_lm(_synthetic_corpus(), dim=16, epochs=60, seed=0)


def test_tokenize_words():
    assert tokenize_words("Hello, world! Don't stop.") == ["hello", "world", "don't", "stop"]


def test_skipgram_learns_distributional_similarity(lm):
    # words sharing contexts embed closer than words from different frames
    same_frame = lm.similarity("cat", "dog")
    cross_frame = lm.similarity("cat", "blue")
    assert same_frame > cross_frame + 0.1, (same_frame, cross_frame)
    assert lm.similarity("red", "blue") > lm.similarity("red", "dog")


def test_embed_shapes_normalized_and_oov(lm):
    emb = lm.embed(["cat", "zorgon"])
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-4)
    # OOV is deterministic
    np.testing.assert_array_equal(lm.embed(["zorgon"]), lm.embed(["zorgon"]))


def test_save_load_roundtrip(lm, tmp_path):
    p = lm.save(tmp_path / "lm.pkl")
    lm2 = WordLM.load(p)
    np.testing.assert_array_equal(lm.embeddings, lm2.embeddings)
    assert lm.vocab == lm2.vocab


def test_lm_feat_handler_uses_trained_lm(lm, tmp_path):
    from speechflow_tpu.data.processors.ling import LM_FEAT_DIM, lm_feat_for_words

    ckpt = str(lm.save(tmp_path / "lm.pkl"))
    feats = lm_feat_for_words(["cat", "dog", "blue"], model_ckpt=ckpt)
    assert feats.shape == (3, LM_FEAT_DIM)
    # trained path differs from the hash fallback
    fallback = lm_feat_for_words(["cat", "dog", "blue"])
    assert not np.allclose(feats, fallback)
    # distributional structure survives the handler
    sim = lambda a, b: float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert sim(feats[0], feats[1]) > sim(feats[0], feats[2])


def test_prosody_model_warmstart(lm):
    import jax.numpy as jnp
    from flax import nnx

    from speechflow_tpu.models.prosody import ProsodyModel, ProsodyParams

    params = ProsodyParams(vocab_size=len(lm.vocab) + 1, dim=32, n_layers=1,
                           n_heads=2, tokenizer="word_lm")
    model = ProsodyModel(params, rngs=nnx.Rngs(0))
    before = np.asarray(model.emb.embedding[...]).copy()
    model.warmstart_embeddings(lm.embeddings)
    after = np.asarray(model.emb.embedding[...])
    assert not np.allclose(before[: len(lm.vocab), :16], after[: len(lm.vocab), :16])
    ids = jnp.asarray(lm.token_ids(["cat", "dog"])[None])
    out = model({"token_ids": ids, "lengths": jnp.asarray([2])})
    assert out["binary"].shape == (1, 2, 2)
