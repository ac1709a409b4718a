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


def test_phoneme_lm_and_xpbert_feat(tmp_path):
    """Phoneme-level skip-gram (train_token_lm) + add_xpbert_feat handler —
    the XPhoneBERT-equivalent (reference: tts_text_processors.py:782)."""
    import numpy as _np

    from speechflow_tpu.data.core.datasample import TTSDataSample
    from speechflow_tpu.data.processors import get_handler
    from speechflow_tpu.data.processors.ling import XPBERT_FEAT_DIM
    from speechflow_tpu.data.processors.text import SIL
    from speechflow_tpu.models.prosody.lm import train_token_lm

    rng = _np.random.default_rng(0)
    # phoneme "sentences": vowels a/e alternate contexts with consonants
    seqs = []
    for _ in range(300):
        v = ["AA", "EH"][rng.integers(2)]
        seqs.append(["HH", v, "L", v, "OW"])
        seqs.append(["P", v, "T", v, "K"])
    lm = train_token_lm(seqs, dim=XPBERT_FEAT_DIM, epochs=30, seed=0)
    assert lm.similarity("aa", "eh") > lm.similarity("aa", "k")

    ckpt = str(lm.save(tmp_path / "ph_lm.pkl"))
    ds = TTSDataSample(phonemes=["HH", "AA", SIL, "K"],
                       transcription=_np.arange(6))  # with BOS/EOS
    out = get_handler("add_xpbert_feat")(ds, model_ckpt=ckpt)
    assert out.xpbert_feat.shape == (6, XPBERT_FEAT_DIM)
    _np.testing.assert_allclose(out.xpbert_feat[0], 0.01, rtol=1e-6)   # BOS
    _np.testing.assert_allclose(out.xpbert_feat[-1], -0.01, rtol=1e-6)  # EOS
    _np.testing.assert_allclose(out.xpbert_feat[3], 0.1, rtol=1e-6)    # SIL

    # fallback path (no checkpoint) also fills the field
    ds2 = TTSDataSample(phonemes=["HH", "AA"], transcription=_np.arange(2))
    out2 = get_handler("add_xpbert_feat")(ds2)
    assert out2.xpbert_feat.shape == (2, XPBERT_FEAT_DIM)

    # the model consumes it
    import jax.numpy as jnp
    from flax import nnx

    from speechflow_tpu.models.tts import ParallelTTSModel, ParallelTTSParams
    from speechflow_tpu.models.tts.data_types import TTSForwardInput

    p = ParallelTTSParams.create(dict(
        n_symbols=30, n_mels=20, encoder_dim=32, encoder_layers=1,
        decoder_dim=32, decoder_layers=1, token_emb_dim=32, postnet_dim=32,
        speaker_emb_dim=16, max_output_length=32, use_xpbert_feat=True,
        variances=()))
    model = ParallelTTSModel(p, rngs=nnx.Rngs(0))
    inp = TTSForwardInput(
        transcription=jnp.asarray(rng.integers(1, 30, (1, 8)), jnp.int32),
        transcription_lengths=jnp.asarray([8], jnp.int32),
        speaker_id=jnp.zeros((1,), jnp.int32), lang_id=jnp.zeros((1,), jnp.int32),
        xpbert_feat=jnp.asarray(rng.normal(size=(1, 8, XPBERT_FEAT_DIM)).astype(_np.float32)))
    o1 = model.inference(inp, t_out=32)
    o2 = model.inference(__import__("dataclasses").replace(inp, xpbert_feat=None), t_out=32)
    assert not _np.allclose(_np.asarray(o1.spectrogram), _np.asarray(o2.spectrogram))
