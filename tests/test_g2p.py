"""Trained G2P: corpus mining, alignment, window-classifier training, the
raw-text parser hook, and the held-out quality gate (VERDICT r2 next-step #2).

The char-level fallback tokenizes raw text into *letters*, which are not in
the phoneme alphabet the acoustic model trained on — its phoneme accuracy is
exactly zero.  The tests assert the trained G2P emits only real phonemes and
(slow tier) beats a stated held-out PER threshold."""

import numpy as np
import pytest

from speechflow_tpu.models.g2p import (
    G2P,
    align_lexicon,
    mine_g2p_lexicon,
    phoneme_error_rate,
    train_g2p,
)
from tests.paths import MINI_SEGS


@pytest.fixture(scope="module")
def lexicon(request):
    import os
    from pathlib import Path

    root = f"{MINI_SEGS}"
    if not os.path.isdir(root):
        pytest.skip("reference mini dataset unavailable")
    lex = mine_g2p_lexicon(sorted(Path(root).rglob("*.TextGrid*")))
    assert lex
    return lex


@pytest.fixture(scope="module")
def tiny_g2p(lexicon):
    # quick-budget model: enough for API/inventory tests, not for quality
    return train_g2p(lexicon, steps=60, hidden=128)


def test_mine_lexicon_structure(lexicon):
    langs = {l for l, _, _ in lexicon}
    assert "EN" in langs and "RU" in langs
    for lang, word, pron in lexicon:
        assert word == word.lower() and len(word) >= 1
        assert isinstance(pron, tuple) and len(pron) >= 1


def test_alignment_reconstructs_pronunciations(lexicon):
    aligns = align_lexicon(lexicon)
    ok = 0
    for (_, w, pron), chunks in zip(lexicon, aligns):
        if chunks is None:
            continue
        assert len(chunks) == len(w)
        flat = tuple(p for ch in chunks for p in ch)
        assert flat == pron  # chunks partition the pronunciation in order
        ok += 1
    assert ok / len(lexicon) > 0.95  # nearly everything aligns


def test_lexicon_first_and_neural_inventory(tiny_g2p, lexicon):
    g2p = tiny_g2p
    # in-lexicon words reproduce mined pronunciations exactly
    lang, word, pron = lexicon[1]
    assert g2p.predict([word], lang)[0] == pron
    # OOV words decode to phonemes from the real inventory, never letters
    inventory = set(g2p.phoneme_inventory)
    for pred in g2p.predict(["zyxyl", "hellos", "quorbit"], "EN",
                            use_lexicon=False):
        assert set(pred) <= inventory


def test_save_load_roundtrip(tiny_g2p, tmp_path):
    p = tiny_g2p.save(tmp_path / "g2p.pkl")
    back = G2P.load(p)
    words = ["about", "zyxyl"]
    assert back.predict(words, "EN") == tiny_g2p.predict(words, "EN")


def test_parser_hook_emits_phonemes_not_chars(tiny_g2p):
    from speechflow_tpu.data.processors.text import SIL, G2PParserHook

    hook = G2PParserHook(tiny_g2p)
    out = hook("Hello world, this is a test.")
    assert out and out[-1] == SIL  # trailing '.' becomes one pause
    inventory = set(tiny_g2p.phoneme_inventory) | {SIL}
    assert set(out) <= inventory
    # the char fallback would emit letters: prove the output space differs
    assert not set(out) & set("bcdfghjklmnpqrstvwxz")


def test_per_metric():
    assert phoneme_error_rate(("A", "B"), ("A", "B")) == 0.0
    assert phoneme_error_rate((), ("A", "B")) == 1.0
    assert phoneme_error_rate(("A", "C"), ("A", "B")) == 0.5


@pytest.mark.slow
def test_heldout_per_beats_threshold(lexicon):
    """Full-budget training generalizes: held-out PER ≤ 0.31 and word
    exact-match ≥ 0.26 (r5 shipped recipe — full-word BiGRU h=64, 3-seed
    ensemble, 1200 scan steps: canonical split 0.282 / 0.32, seeds 7/13 gave
    0.270-0.272 / 0.24-0.32, 3-fold CV 0.250 / 0.33; thresholds leave seed
    margin.  The r4 window MLP measures 0.308 / 0.28 on the same
    BOS/EOS-filtered lexicon).  The char fallback's PER is ~1.0 by
    construction — every emitted symbol is a letter."""
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(lexicon))
    held = [lexicon[i] for i in idx[:25]]
    train = [lexicon[i] for i in idx[25:]]
    g2p = train_g2p(train)  # shipped defaults ARE the recipe under test
    pers = []
    for lang in sorted({h[0] for h in held}):
        words = [w for hl, w, _ in held if hl == lang]
        preds = dict(zip(words, g2p.predict(words, lang, use_lexicon=False)))
        pers += [phoneme_error_rate(preds[w], pron)
                 for hl, w, pron in held if hl == lang]
    per = float(np.mean(pers))
    exact = float(np.mean([p == 0.0 for p in pers]))
    assert per <= 0.31, f"held-out PER {per:.3f} regressed past 0.31"
    assert exact >= 0.26, f"word exact-match {exact:.2f} regressed past 0.26"
