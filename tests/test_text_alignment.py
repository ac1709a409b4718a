"""nmalign-style robust text<->ASR alignment (VERDICT r2 next-step #10).

Builds an "audiobook" by concatenating the real mini-corpus utterances into
one word timeline, corrupts the ASR side the way real ASR fails (character
typos, dropped words, inserted fillers), and asserts the banded NW aligner
still recovers the utterance boundaries — the capability of the reference's
nmalign.py + fuzzy_sequence_matcher.py that exact-block matching lacks."""

import os
from pathlib import Path

import numpy as np
import pytest

from speechflow_tpu.annotator.text_alignment import (
    align_words,
    nm_align,
    normalize_word,
    word_similarity,
)
from tests.paths import MINI_SEGS

SEGS = f"{MINI_SEGS}/EN"


def test_word_similarity_basics():
    assert word_similarity("weather", "weather") == 1.0
    assert word_similarity("weather", "whether") >= 0.7
    assert word_similarity("abc", "xyz") == 0.0
    assert word_similarity("", "abc") == 0.0


def test_nm_align_identity():
    words = ["the", "quick", "brown", "fox", "jumps"]
    pairs = nm_align(words, words)
    assert [(i, j) for i, j, _ in pairs] == [(k, k) for k in range(5)]
    assert all(s == 1.0 for _, _, s in pairs)


def test_nm_align_substitutions_still_anchor():
    ref = ["printing", "in", "the", "only", "sense", "with", "which", "we"]
    asr = ["prnting", "in", "thee", "only", "sens", "with", "wich", "we"]
    pairs = nm_align(ref, asr)
    # every position anchors despite zero exact matches in half the words
    assert [(i, j) for i, j, _ in pairs] == [(k, k) for k in range(len(ref))]


def test_nm_align_insertions_deletions():
    ref = ["a", "b", "c", "d", "e", "f"]
    asr = ["a", "uh", "b", "d", "e", "um", "f"]  # ins "uh"/"um", del "c"
    pairs = {(i, j) for i, j, _ in nm_align(ref, asr)}
    assert (0, 0) in pairs and (1, 2) in pairs
    assert (3, 3) in pairs and (4, 4) in pairs and (5, 6) in pairs
    assert not any(i == 2 for i, _ in pairs)  # deleted word stays unmatched


def _corrupt(words, times, rate, rng):
    """ASR-style corruption: typo / delete / insert at ``rate`` of positions."""
    fillers = ["uh", "um", "eh", "mm"]
    out_w, out_t = [], []
    for w, (b, e) in zip(words, times):
        r = rng.uniform()
        if r < rate / 3:                      # deletion
            continue
        if r < 2 * rate / 3 and len(w) > 3:   # typo: drop + swap a char
            k = rng.integers(1, len(w) - 1)
            w = w[:k] + w[k + 1:]
            if len(w) > 3:
                k = int(rng.integers(0, len(w) - 1))
                w = w[:k] + w[k + 1] + w[k] + w[k + 2:]
        out_w.append(w)
        out_t.append((b, e))
        if r > 1 - rate / 3:                  # insertion after
            out_w.append(fillers[int(rng.integers(0, len(fillers)))])
            out_t.append((e, e + 0.05))
    return out_w, out_t


@pytest.mark.skipif(not os.path.isdir(SEGS), reason="reference mini dataset unavailable")
@pytest.mark.parametrize("rate", [0.1, 0.2])
def test_audiobook_boundary_recovery_under_corruption(rate):
    from speechflow_tpu.io import AudioSeg

    rng = np.random.default_rng(0)
    words, times, starts = [], [], []
    t_ofs = 0.0
    for p in sorted(Path(SEGS).rglob("*.TextGridStage3"))[:60]:
        seg = AudioSeg.load(p)
        ws = [(s, e, w) for s, e, w in seg.words() if normalize_word(w)]
        if not ws:
            continue
        starts.append((len(words), t_ofs + ws[0][0]))
        for s, e, w in ws:
            words.append(w)  # raw labels: punctuation marks sentence ends
            times.append((t_ofs + s, t_ofs + e))
        # synthetic audiobook: utterances separated by silence, and the last
        # word gains the terminal period real book text would carry
        if not words[-1].rstrip().endswith((".", "!", "?", ";")):
            words[-1] += "."
        t_ofs += seg.words()[-1][1] + 0.3
    assert len(words) > 400

    asr_w, asr_t = _corrupt([normalize_word(w) for w in words], times, rate, rng)
    asr = [[w, b, e] for w, (b, e) in zip(asr_w, asr_t)]
    aligned = align_words(words, asr, total_duration=t_ofs)

    recovered = sum(
        1 for idx, true_b in starts if abs(aligned[idx][1] - true_b) <= 0.2)
    frac = recovered / len(starts)
    assert frac >= 0.95, (
        f"only {frac:.0%} of {len(starts)} utterance boundaries recovered "
        f"under {rate:.0%} ASR corruption")
