"""Fuzzy alignment of reference text to ASR word timestamps.

Capability parity with the reference alignment utilities
(annotator/utils/{fuzzy_sequence_matcher.py, nmalign.py, text_alignment.py}):
normalize both word sequences, align with difflib's longest-matching-block
algorithm, and transfer ASR timestamps onto the reference words,
interpolating over unmatched stretches.
"""

from __future__ import annotations

import difflib
import re
import typing as tp

import numpy as np

__all__ = ["normalize_word", "tokenize_text", "align_words"]

_PUNCT = re.compile(r"[^\w']+", re.UNICODE)


def normalize_word(w: str) -> str:
    return _PUNCT.sub("", w).lower()


def tokenize_text(text: str) -> tp.List[str]:
    return [w for w in text.strip().split() if normalize_word(w)]


def align_words(
    ref_words: tp.Sequence[str],
    asr_timestamps: tp.Sequence[tp.Sequence],   # [[word, b, e], ...]
    total_duration: tp.Optional[float] = None,
) -> tp.List[tp.Tuple[str, float, float]]:
    """Assign [begin, end) to every reference word.

    Matched words copy their ASR interval; unmatched runs are linearly
    interpolated between surrounding anchors (reference behavior for ASR
    deletions/substitutions).
    """
    asr_words = [normalize_word(str(t[0])) for t in asr_timestamps]
    ref_norm = [normalize_word(w) for w in ref_words]

    sm = difflib.SequenceMatcher(a=ref_norm, b=asr_words, autojunk=False)
    begins = np.full(len(ref_words), np.nan)
    ends = np.full(len(ref_words), np.nan)
    for block in sm.get_matching_blocks():
        for k in range(block.size):
            begins[block.a + k] = float(asr_timestamps[block.b + k][1])
            ends[block.a + k] = float(asr_timestamps[block.b + k][2])

    if total_duration is None:
        total_duration = float(asr_timestamps[-1][2]) if asr_timestamps else 1.0

    # interpolate unmatched words between anchors
    n = len(ref_words)
    anchor_idx = [i for i in range(n) if not np.isnan(begins[i])]
    if not anchor_idx:
        # uniform fallback
        edges = np.linspace(0.0, total_duration, n + 1)
        return [(w, float(edges[i]), float(edges[i + 1])) for i, w in enumerate(ref_words)]

    i = 0
    while i < n:
        if not np.isnan(begins[i]):
            i += 1
            continue
        j = i
        while j < n and np.isnan(begins[j]):
            j += 1
        left_t = ends[i - 1] if i > 0 else 0.0
        right_t = begins[j] if j < n else total_duration
        span = max(right_t - left_t, 1e-3)
        k = j - i
        edges = np.linspace(left_t, right_t, k + 1)
        for m in range(k):
            begins[i + m] = edges[m]
            ends[i + m] = edges[m + 1]
        i = j

    # enforce monotonicity
    for i in range(1, n):
        if begins[i] < ends[i - 1]:
            begins[i] = ends[i - 1]
        if ends[i] < begins[i]:
            ends[i] = begins[i] + 1e-3
    return [(w, float(b), float(e)) for w, b, e in zip(ref_words, begins, ends)]
