"""Fuzzy alignment of reference text to ASR word timestamps.

Capability parity with the reference alignment utilities
(annotator/utils/{fuzzy_sequence_matcher.py, nmalign.py, text_alignment.py}):
normalize both word sequences, align them with a banded Needleman-Wunsch over
*character-level word similarity* (the nmalign matrix-alignment approach — so
ASR substitutions like "weather"->"whether" still anchor, unlike exact-match
block algorithms), and transfer ASR timestamps onto the reference words,
interpolating over unmatched stretches.

The band rides the length-ratio diagonal, keeping the DP linear in sequence
length for audiobook-scale inputs; exact matches shortcut the similarity
computation.
"""

from __future__ import annotations

import re
import typing as tp

import numpy as np

__all__ = ["normalize_word", "tokenize_text", "align_words",
           "word_similarity", "nm_align"]

_PUNCT = re.compile(r"[^\w']+", re.UNICODE)


def normalize_word(w: str) -> str:
    return _PUNCT.sub("", w).lower()


def tokenize_text(text: str) -> tp.List[str]:
    return [w for w in text.strip().split() if normalize_word(w)]


def word_similarity(a: str, b: str) -> float:
    """1 - normalized Levenshtein distance (0..1; 1 = identical)."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if abs(la - lb) >= max(la, lb):
        return 0.0
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i]
        for j in range(1, lb + 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != b[j - 1])))
        prev = cur
    return 1.0 - prev[lb] / max(la, lb)


def nm_align(
    ref: tp.Sequence[str],
    asr: tp.Sequence[str],
    band: tp.Optional[int] = None,
    gap_penalty: float = -0.45,
    min_similarity: float = 0.5,
) -> tp.List[tp.Tuple[int, int, float]]:
    """Banded Needleman-Wunsch word alignment (reference nmalign.py capability).

    Returns matched (ref_idx, asr_idx, similarity) pairs with similarity >=
    ``min_similarity``; insertions/deletions on either side become gaps.  The
    band is centred on the length-ratio diagonal: cost O(N * band) instead of
    O(N * M), which is what makes audiobook-length inputs feasible."""
    N, M = len(ref), len(asr)
    if N == 0 or M == 0:
        return []
    if band is None:
        band = max(50, 2 * abs(N - M) + 20)
    band = min(band, M)

    NEG = -1e18
    # D[i] stored as a band row: offset[i] = window start in asr coordinates
    offsets = np.empty(N + 1, np.int64)
    rows: tp.List[np.ndarray] = []
    bks: tp.List[np.ndarray] = []  # 0=diag, 1=up (ref gap), 2=left (asr gap)

    def center(i: int) -> int:
        return int(round(i * M / N))

    sims: tp.Dict[tp.Tuple[int, int], float] = {}

    for i in range(N + 1):
        lo = max(0, center(i) - band)
        hi = min(M, center(i) + band)
        offsets[i] = lo
        width = hi - lo + 1
        row = np.full(width, NEG)
        bk = np.zeros(width, np.int8)
        if i == 0:
            row[:] = np.arange(lo, hi + 1) * gap_penalty
            bk[:] = 2
        else:
            prev, plo = rows[i - 1], offsets[i - 1]
            w = ref[i - 1]
            for j in range(lo, hi + 1):
                best, arg = NEG, 0
                pj = j - plo
                if 0 <= pj < len(prev) and prev[pj] > NEG / 2:      # up
                    v = prev[pj] + gap_penalty
                    if v > best:
                        best, arg = v, 1
                if j > lo and row[j - lo - 1] > NEG / 2:            # left
                    v = row[j - lo - 1] + gap_penalty
                    if v > best:
                        best, arg = v, 2
                if j > 0 and 0 <= j - 1 - plo < len(prev) \
                        and prev[j - 1 - plo] > NEG / 2:            # diag
                    s = sims.get((i - 1, j - 1))
                    if s is None:
                        s = word_similarity(w, asr[j - 1])
                        sims[(i - 1, j - 1)] = s
                    v = prev[j - 1 - plo] + (2.0 * s - 1.0)
                    if v > best:
                        best, arg = v, 0
                row[j - lo], bk[j - lo] = best, arg
        rows.append(row)
        bks.append(bk)

    # backtrack from (N, M)
    pairs: tp.List[tp.Tuple[int, int, float]] = []
    i, j = N, M
    while i > 0 or j > 0:
        if j - offsets[i] < 0 or j - offsets[i] >= len(rows[i]):
            break  # fell off the band (degenerate input); stop cleanly
        move = bks[i][j - offsets[i]]
        if move == 0 and i > 0 and j > 0:
            s = sims.get((i - 1, j - 1), 0.0)
            if s >= min_similarity:
                pairs.append((i - 1, j - 1, s))
            i, j = i - 1, j - 1
        elif move == 1 and i > 0:
            i -= 1
        elif j > 0:
            j -= 1
        else:
            i -= 1
    pairs.reverse()
    return pairs


def align_words(
    ref_words: tp.Sequence[str],
    asr_timestamps: tp.Sequence[tp.Sequence],   # [[word, b, e], ...]
    total_duration: tp.Optional[float] = None,
) -> tp.List[tp.Tuple[str, float, float]]:
    """Assign [begin, end) to every reference word.

    Matched words (banded NW over char-level similarity — ASR substitutions
    and typos still anchor) copy their ASR interval; unmatched runs are
    linearly interpolated between surrounding anchors (reference behavior for
    ASR deletions/insertions).
    """
    asr_words = [normalize_word(str(t[0])) for t in asr_timestamps]
    ref_norm = [normalize_word(w) for w in ref_words]

    begins = np.full(len(ref_words), np.nan)
    ends = np.full(len(ref_words), np.nan)
    for i, j, _sim in nm_align(ref_norm, asr_words):
        begins[i] = float(asr_timestamps[j][1])
        ends[i] = float(asr_timestamps[j][2])

    if total_duration is None:
        total_duration = float(asr_timestamps[-1][2]) if asr_timestamps else 1.0

    # interpolate unmatched words between anchors
    n = len(ref_words)
    anchor_idx = [i for i in range(n) if not np.isnan(begins[i])]
    if not anchor_idx:
        # uniform fallback
        edges = np.linspace(0.0, total_duration, n + 1)
        return [(w, float(edges[i]), float(edges[i + 1])) for i, w in enumerate(ref_words)]

    # speaking rate from the anchored words, for duration-proportional fill
    anch_secs = sum(ends[k] - begins[k] for k in anchor_idx)
    anch_chars = sum(len(ref_norm[k]) for k in anchor_idx) or 1
    sec_per_char = max(anch_secs / anch_chars, 1e-3)

    _TERMINAL = (".", "!", "?", ";")

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
        # duration-proportional estimates; any surplus span is silence and is
        # placed at terminal punctuation (utterance/sentence gaps live there),
        # so a deleted first-word-of-utterance doesn't swallow the pause
        est = np.array([max(len(ref_norm[i + m]), 1) * sec_per_char
                        for m in range(k)])
        gaps = np.zeros(k + 1)  # silence before word m (gaps[k] = after run)
        surplus = span - est.sum()
        if surplus > 0:
            punct_slots = [0] if (i > 0 and str(ref_words[i - 1]).rstrip()
                                  .endswith(_TERMINAL)) else []
            punct_slots += [m + 1 for m in range(k)
                            if str(ref_words[i + m]).rstrip().endswith(_TERMINAL)]
            if punct_slots:
                for slot in punct_slots:
                    gaps[slot] += surplus / len(punct_slots)
            else:
                gaps[:] = surplus / (k + 1)
        else:
            est = est * (span / est.sum())
        t = left_t
        for m in range(k):
            t += gaps[m]
            begins[i + m] = t
            t = min(t + est[m], right_t)
            ends[i + m] = t
        i = j

    # enforce monotonicity
    for i in range(1, n):
        if begins[i] < ends[i - 1]:
            begins[i] = ends[i - 1]
        if ends[i] < begins[i]:
            ends[i] = begins[i] + 1e-3
    return [(w, float(b), float(e)) for w, b, e in zip(ref_words, begins, ends)]
