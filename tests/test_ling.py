"""Linguistic frontend: real parser tiers from TextGridStage3 -> per-phoneme
ling_feat/prosody/word_lengths, rule tagger for the raw-text path, and the
features reaching the acoustic model."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from speechflow_tpu.data.processors.ling import (
    LING_FEAT_DIM,
    LM_FEAT_DIM,
    PUNCT_CLASSES,
    UD_RELS,
    UPOS,
    RuleBasedTagger,
    _INT0,
    _POS0,
    _PUNCT0,
    _REL0,
    ling_feat_from_text,
    lm_feat_for_words,
)
from tests.paths import MINI_SEGS

SEG = f"{MINI_SEGS}/EN/LJSpeech/000/0.TextGridStage3"


def test_rule_tagger():
    tag = RuleBasedTagger()
    assert tag("the") == "DET"
    assert tag("quickly") == "ADV"
    assert tag("running") == "VERB"
    assert tag("with") == "ADP"
    assert tag("happiness") == "NOUN"
    assert tag("42") == "NUM"
    assert tag("is") == "AUX"
    assert tag("and") == "CCONJ"


def _sample(mini_dataset_path=None):
    from speechflow_tpu.data.parsers import TTSDSParser

    parser = TTSDSParser()
    ds_set = parser.read_datasamples([SEG])
    assert len(ds_set) == 1
    return ds_set[0]


def test_parser_carries_word_tiers(mini_dataset_path):
    ds = _sample()
    n_words = len(ds.text.split())
    assert ds.pos_tags is not None and len(ds.pos_tags) == n_words
    assert ds.syntax_rels is not None and len(ds.syntax_rels) == n_words
    assert ds.emphasis_labels is not None and len(ds.emphasis_labels) == n_words
    assert ds.syntagma_ids is not None and len(ds.syntagma_ids) == n_words
    # the real parser output: first word of LJ001-0001 is a NOUN/nsubj
    assert ds.pos_tags[0] == "NOUN"
    assert ds.syntax_rels[0] == "nsubj"


def test_add_ling_feat_alignment(mini_dataset_path):
    from speechflow_tpu.data.processors.ling import add_ling_feat
    from speechflow_tpu.data.processors.text import Alphabet, TTSTextProcessor
    from speechflow_tpu.data.processors.tts import add_pauses_from_timestamps

    ds = _sample()
    ds = add_pauses_from_timestamps(ds)
    proc = TTSTextProcessor(Alphabet(sorted(set(p for p in ds.phonemes))))
    ds = proc.process(ds)
    ds = add_ling_feat(ds)

    n = len(ds.transcription)
    assert ds.ling_feat.shape == (n, LING_FEAT_DIM)
    assert ds.prosody.shape == (n,)
    assert ds.word_lengths.sum() == n

    # BOS/EOS rows are sil-marked, zero elsewhere
    assert ds.ling_feat[0, 0] == 1.0 and ds.ling_feat[-1, 0] == 1.0
    assert ds.ling_feat[0, _POS0:].sum() == 0.0

    # every non-sil row carries exactly one POS, one punct class, one rel
    pos_block = ds.ling_feat[:, _POS0:_POS0 + len(UPOS)]
    word_rows = ds.ling_feat[:, 0] == 0.0
    assert (pos_block[word_rows].sum(axis=1) == 1.0).all()
    rel_block = ds.ling_feat[:, _REL0:_REL0 + len(UD_RELS)]
    assert (rel_block[word_rows].sum(axis=1) == 1.0).all()

    # first word ("printing,") is NOUN with comma punctuation, spanning its phonemes
    first_word = np.nonzero(word_rows)[0][0]
    assert pos_block[first_word, UPOS.index("NOUN")] == 1.0
    punct_block = ds.ling_feat[:, _PUNCT0:_PUNCT0 + len(PUNCT_CLASSES)]
    assert punct_block[first_word, PUNCT_CLASSES.index(",")] == 1.0
    # declarative sentence -> "." intonation on word rows
    assert ds.ling_feat[first_word, _INT0] == 1.0


def test_lm_feat(mini_dataset_path):
    from speechflow_tpu.data.processors.ling import add_lm_feat
    from speechflow_tpu.data.processors.text import Alphabet, TTSTextProcessor
    from speechflow_tpu.data.processors.tts import add_pauses_from_timestamps

    ds = _sample()
    ds = add_pauses_from_timestamps(ds)
    proc = TTSTextProcessor(Alphabet(sorted(set(ds.phonemes))))
    ds = proc.process(ds)
    ds = add_lm_feat(ds)
    assert ds.lm_feat.shape == (len(ds.transcription), LM_FEAT_DIM)
    # deterministic and word-identity sensitive
    a = lm_feat_for_words(["printing", "printing", "exhibition"])
    assert np.allclose(a[0], a[1])
    assert not np.allclose(a[0], a[2])
    # similar words are closer than dissimilar ones (subword composition)
    b = lm_feat_for_words(["print", "printing", "concerned"])
    cos = lambda x, y: float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-9))
    assert cos(b[0], b[1]) > cos(b[0], b[2])


def test_ling_feat_from_text():
    words = ["hello,", "world?"]
    mat = ling_feat_from_text(words, [4, 3], add_service_tokens=True, intonation="?")
    assert mat.shape == (9, LING_FEAT_DIM)
    assert mat[0, 0] == 1.0 and mat[-1, 0] == 1.0  # service rows
    assert mat[1, 1] == 1.0  # word begin
    assert mat[4, 2] == 1.0  # word end
    assert mat[1, _INT0 + 1] == 1.0  # "?" intonation


def test_ling_feat_reaches_model(mini_dataset_path):
    """E2E: ParallelTTSModel(use_ling_feat/use_prosody/use_lm_feat) consumes
    the produced features — outputs must differ when features are zeroed."""
    import dataclasses

    from speechflow_tpu.models.tts import ParallelTTSModel, ParallelTTSParams

    params = ParallelTTSParams.create(
        n_symbols=64, n_speakers=2, n_mels=20, token_emb_dim=32, encoder_dim=32,
        encoder_layers=1, decoder_type="wrapper", decoder_dim=32, decoder_layers=1,
        speaker_emb_dim=16, postnet_dim=32, max_output_length=32,
        use_ling_feat=True, use_lm_feat=True, use_prosody=True)
    model = ParallelTTSModel(params, rngs=nnx.Rngs(0))

    from speechflow_tpu.models.tts.data_types import TTSForwardInput

    rng = np.random.default_rng(0)
    b, n, t = 2, 8, 32
    durs = np.full((b, n), t // n, np.float32)
    inputs = TTSForwardInput(
        transcription=jnp.asarray(rng.integers(1, 64, (b, n)), jnp.int32),
        transcription_lengths=jnp.full((b,), n, jnp.int32),
        speaker_id=jnp.zeros((b,), jnp.int32),
        durations=jnp.asarray(durs),
        ling_feat=jnp.asarray(rng.normal(size=(b, n, LING_FEAT_DIM)).astype(np.float32)),
        lm_feat=jnp.asarray(rng.normal(size=(b, n, LM_FEAT_DIM)).astype(np.float32)),
        prosody=jnp.asarray(rng.integers(-1, 5, (b, n)), jnp.int32),
    )
    out1 = model(inputs, training=False, t_out=t).spectrogram
    zeroed = dataclasses.replace(inputs, ling_feat=jnp.zeros_like(inputs.ling_feat),
                                 lm_feat=jnp.zeros_like(inputs.lm_feat),
                                 prosody=jnp.full_like(inputs.prosody, -1))
    out2 = model(zeroed, training=False, t_out=t).spectrogram
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


@pytest.mark.slow
def test_ling_feat_through_pipeline(mini_dataset_path):
    """Full config-driven pipeline produces collated ling_feat/prosody."""
    from pathlib import Path

    from speechflow_tpu.data.core.components import DataPipeline

    cfg_path = Path(__file__).parent.parent / "configs" / "tts_data_24khz.yml"
    dp = DataPipeline.init_from_config(cfg_path, value_select=["debug"])
    dp.cfg.set_path("dirs.data_root", f"{mini_dataset_path}/EN")
    dp.init_components()
    batch = dp["train"].sample_batch(2)
    c = batch.collated_samples
    assert c.ling_feat is not None and c.ling_feat.shape[-1] == LING_FEAT_DIM
    assert c.ling_feat.shape[:2] == c.transcription.shape
    assert c.lm_feat is not None and c.lm_feat.shape[-1] == LM_FEAT_DIM
    assert c.prosody is not None and c.prosody.dtype == np.int32


def test_arpabet_to_ipa_mapping():
    """IPA phoneme mapping (reference: TTSTextProcessor ipa modes,
    tts_text_processors.py:78): stress diacritics, passthrough for service
    tokens/unknowns, full coverage of the ARPABET set."""
    from speechflow_tpu.data.processors.text import (
        ARPABET_TO_IPA,
        SIL,
        Alphabet,
        phonemes_to_ipa,
        to_ipa,
    )

    assert to_ipa("AA1") == "ˈɑ"
    assert to_ipa("AA2") == "ˌɑ"
    assert to_ipa("AA0") == "ɑ"
    assert to_ipa("CH") == "tʃ"
    assert to_ipa(SIL) == SIL
    assert to_ipa("??") == "??"  # unknown passes through
    seq = phonemes_to_ipa(["HH", "AH0", "L", "OW1", SIL])
    assert seq == ["h", "ʌ", "l", "ˈoʊ", SIL]
    # an IPA alphabet with stress variants (the reference's "truncated" mode
    # adds stressed copies of every phone) encodes round-trip
    base = sorted(set(ARPABET_TO_IPA.values()))
    alpha = Alphabet(base + ["ˈ" + p for p in base] + ["ˌ" + p for p in base])
    ids = alpha.encode(seq[:4])
    assert (ids > 0).all()
    assert alpha.decode(ids) == seq[:4]
