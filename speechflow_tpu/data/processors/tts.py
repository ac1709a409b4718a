"""TTS alignment-derived handlers: pauses, durations, aggregates, gate.

Capability parity with the reference tts_processors
(speechflow/data_pipeline/datasample_processors/tts_processors.py:110,315,486,598,801):
pause insertion from timestamp gaps, timestamps -> per-token frame durations
(exact reconciliation to the mel length), frame->token feature aggregation
(mean/median/min/max over each token's frames), and the stop-gate target.
"""

from __future__ import annotations

import typing as tp

import numpy as np

from speechflow_tpu.data.core.datasample import TTSDataSample
from speechflow_tpu.data.processors import handler
from speechflow_tpu.data.processors.text import BOS, EOS, SIL
from speechflow_tpu.io import Timestamps

__all__ = []


@handler(inputs={"phonemes"}, outputs={"phonemes"}, optional={"word_timestamps"})
def add_pauses_from_text(
    ds: TTSDataSample, level: str = "words", begin_end_pauses: bool = True
) -> TTSDataSample:
    """Insert SIL tokens from the *text*: after every word whose label ends
    with punctuation (level="punctuation") or between all words
    (level="words"), plus BOS/EOS pauses. This is the stage-1 forced-alignment
    recipe, where no reliable timestamps exist yet
    (reference: tts_processors.py:110, SURVEY §A.3).

    Operates on word-grouped phonemes: requires word_timestamps to group the
    phoneme stream (training) or ds.word_lengths (inference).
    """
    if ds.phonemes is None:
        return ds
    # group phonemes by word
    groups: tp.List[tp.List[str]] = []
    if ds.word_timestamps is not None and ds.phoneme_timestamps is not None:
        wts = np.asarray(ds.word_timestamps.intervals, np.float64)
        cur = -2
        for (b, e), lab in zip(ds.phoneme_timestamps, ds.phonemes):
            mid = 0.5 * (b + e)
            hits = np.nonzero((wts[:, 0] - 1e-6 <= mid) & (mid <= wts[:, 1] + 1e-6))[0]
            w = int(hits[0]) if len(hits) else -1
            if w != cur or not groups:
                groups.append([])
                cur = w
            groups[-1].append(lab)
    elif ds.word_lengths is not None:
        pos = 0
        for n in ds.word_lengths:
            groups.append(list(ds.phonemes[pos:pos + int(n)]))
            pos += int(n)
    else:
        groups = [[p] for p in ds.phonemes]

    words = ds.text.split() if ds.text else [""] * len(groups)
    out: tp.List[str] = []
    if begin_end_pauses:
        out.append(SIL)
    wi = 0
    for g in groups:
        is_word = any(p not in (SIL, "", None) for p in g)
        out.extend(p if p not in ("", None) else SIL for p in g)
        if is_word:
            word = words[wi] if wi < len(words) else ""
            wi += 1
            trailing_punct = word and not word[-1].isalnum()
            if (level == "words" or trailing_punct) and (out and out[-1] != SIL):
                out.append(SIL)
    if begin_end_pauses and out and out[-1] != SIL:
        out.append(SIL)
    # collapse duplicate SILs
    collapsed: tp.List[str] = []
    for p in out:
        if p == SIL and collapsed and collapsed[-1] == SIL:
            continue
        collapsed.append(p)
    ds.phonemes = collapsed
    # timestamps no longer align after insertion; stage-1 training learns them
    ds.phoneme_timestamps = None
    return ds


@handler(inputs={"phonemes", "phoneme_timestamps"}, outputs={"phonemes", "phoneme_timestamps"})
def add_pauses_from_timestamps(
    ds: TTSDataSample, min_len: float = 0.03, merge_short: bool = True
) -> TTSDataSample:
    """Turn empty-label intervals (gaps) into SIL tokens; gaps shorter than
    ``min_len`` are merged into the preceding token (reference: :315)."""
    if ds.phoneme_timestamps is None:
        return ds  # text-only inference sample: nothing to do
    phs, ts = [], []
    for label, (b, e) in zip(ds.phonemes, ds.phoneme_timestamps):
        dur = e - b
        is_pause = label in ("", SIL, "undefined_sil", None)
        if is_pause:
            if dur >= min_len or not ts:
                phs.append(SIL)
                ts.append([b, e])
            elif merge_short:
                ts[-1][1] = e  # absorb into previous token
            else:
                phs.append(SIL)
                ts.append([b, e])
        else:
            phs.append(label)
            ts.append([b, e])
    ds.phonemes = phs
    ds.phoneme_timestamps = Timestamps(np.asarray(ts))
    return ds


@handler(inputs={"transcription", "phoneme_timestamps"}, outputs={"durations"})
def calc_durations(ds: TTSDataSample) -> TTSDataSample:
    """Per-token frame counts aligned with the transcription (incl. BOS/EOS
    rows when service tokens are on), summing exactly to the mel length."""
    hop = ds.get_param_val("hop_len", ds.hop_len or 256)
    sr = ds.audio_chunk.sr if ds.audio_chunk is not None else ds.get_param_val("sample_rate")
    n_frames = ds.n_frames or None

    ts = ds.phoneme_timestamps
    n_tokens = ds.n_tokens
    has_service = n_tokens == len(ts) + 2
    if has_service:
        # BOS spans [audio begin, first phoneme); EOS spans [last phoneme, audio end)
        total = ds.audio_chunk.duration if ds.audio_chunk is not None else ts.end
        rows = np.concatenate(
            [
                np.asarray([[0.0, ts.begin]]),
                ts.intervals - 0.0,
                np.asarray([[ts.end, max(total, ts.end)]]),
            ],
            axis=0,
        )
        ts = Timestamps(rows)
    ds.durations = ts.to_frames(hop, int(sr), n_frames=n_frames).astype(np.float32)
    assert len(ds.durations) == n_tokens, (len(ds.durations), n_tokens)
    return ds


def _aggregate(feat: np.ndarray, durations: np.ndarray, mode: str = "mean") -> np.ndarray:
    """Reduce frame-level feat (T,) to token-level (N,) given frame counts."""
    edges = np.concatenate([[0], np.cumsum(durations.astype(np.int64))])
    out = np.zeros(len(durations), dtype=np.float32)
    for i in range(len(durations)):
        seg = feat[edges[i] : edges[i + 1]]
        if len(seg) == 0:
            out[i] = 0.0
        elif mode == "mean":
            out[i] = seg.mean()
        elif mode == "median":
            out[i] = np.median(seg)
        elif mode == "min":
            out[i] = seg.min()
        elif mode == "max":
            out[i] = seg.max()
        elif mode == "range":
            out[i] = seg.max() - seg.min()
        else:
            raise ValueError(mode)
    return out


@handler(inputs={"durations", "pitch"}, outputs={"aggregate_pitch"})
def aggregate_pitch(ds: TTSDataSample, mode: str = "mean", voiced_only: bool = True) -> TTSDataSample:
    feat = ds.pitch
    if voiced_only:
        # mean over voiced frames only, per token
        edges = np.concatenate([[0], np.cumsum(ds.durations.astype(np.int64))])
        out = np.zeros(len(ds.durations), dtype=np.float32)
        for i in range(len(ds.durations)):
            seg = feat[edges[i] : edges[i + 1]]
            v = seg[seg > 0]
            out[i] = v.mean() if len(v) else 0.0
        ds.aggregate_pitch = out
    else:
        ds.aggregate_pitch = _aggregate(feat, ds.durations, mode)
    return ds


@handler(inputs={"durations", "energy"}, outputs={"aggregate_energy"})
def aggregate_energy(ds: TTSDataSample, mode: str = "mean") -> TTSDataSample:
    ds.aggregate_energy = _aggregate(ds.energy, ds.durations, mode)
    return ds


@handler(inputs={"mel"}, outputs={"gate"})
def gate_target(ds: TTSDataSample, last_frames: int = 1) -> TTSDataSample:
    t = ds.n_frames
    gate = np.zeros(t, dtype=np.float32)
    gate[max(0, t - last_frames):] = 1.0
    ds.gate = gate
    return ds


@handler(inputs={"transcription"}, outputs={"word_lengths"})
def calc_word_lengths(ds: TTSDataSample) -> TTSDataSample:
    """Tokens per word from word timestamps (used by word-level LM features)."""
    if ds.word_timestamps is None or ds.phoneme_timestamps is None:
        ds.word_lengths = np.asarray([ds.n_tokens], dtype=np.int32)
        return ds
    counts = []
    for wb, we in ds.word_timestamps:
        n = sum(1 for b, e, in ds.phoneme_timestamps if b >= wb - 1e-6 and e <= we + 1e-6)
        counts.append(n)
    ds.word_lengths = np.asarray(counts, dtype=np.int32)
    return ds


@handler(inputs={"audio_chunk", "phonemes", "phoneme_timestamps"},
         outputs={"audio_chunk"})
def apply_fade_inside_pauses(ds: TTSDataSample) -> TTSDataSample:
    """Fade the waveform to silence inside SIL intervals (reference:
    tts_processors.py:454): a steep log-space curve fades out over the first
    half of each pause and back in over the second half, suppressing residual
    breath/noise the aligner lumped into pauses. Edges adjacent to other
    pauses (or the utterance boundary) stay fully silent."""
    if ds.phoneme_timestamps is None or ds.audio_chunk is None:
        return ds
    sr = ds.audio_chunk.sr
    wav = np.array(ds.audio_chunk.waveform)  # writable copy
    phonemes = list(ds.phonemes)
    for idx, (ph, (b, e)) in enumerate(zip(phonemes, ds.phoneme_timestamps)):
        if ph != SIL:
            continue
        a = max(int(b * sr), 0)
        z = min(int(e * sr), len(wav))
        fade_len = z - a
        if fade_len <= 1:
            continue
        l_len = fade_len // 2
        r_len = fade_len - l_len
        l_curve = np.flip(np.logspace(-1.0, 1.0, l_len) ** 4.0 / 10000.0)
        if idx == 0 or phonemes[idx - 1] == SIL:
            l_curve = l_curve * 0.0
        r_curve = np.logspace(-1.0, 1.0, r_len) ** 4.0 / 10000.0
        if idx == len(phonemes) - 1 or (idx + 1 < len(phonemes) and phonemes[idx + 1] == SIL):
            r_curve = r_curve * 0.0
        wav[a:z] = wav[a:z] * np.concatenate([l_curve, r_curve]).astype(np.float32)
    ds.audio_chunk.data = wav.astype(np.float32)
    return ds


@handler(inputs={"durations"}, outputs={"invert_durations"})
def calc_invert_durations(ds: TTSDataSample) -> TTSDataSample:
    """Frame-level 1/duration signal (reference: tts_processors.py:578) —
    each frame carries the reciprocal of its token's duration, used as a
    speaking-rate feature by some decoders."""
    if ds.durations is None:
        return ds
    durs = np.asarray(ds.durations).astype(np.int64)
    inv = np.repeat(
        np.where(durs > 0, 1.0 / np.maximum(durs, 1), 0.0), np.maximum(durs, 0)
    ).astype(np.float32)
    ds.additional["invert_durations"] = inv
    return ds


@handler(inputs={"durations", "transcription"}, outputs={"transcription_by_frames"})
def transcription_by_frames(ds: TTSDataSample) -> TTSDataSample:
    """Frame-level phoneme-id sequence (reference: tts_processors.py:867):
    token ids repeated by their durations — the target for frame-level
    transcription heads trained with the CTC loss."""
    if ds.durations is None or ds.transcription is None:
        return ds
    durs = np.asarray(ds.durations).astype(np.int64)
    ext = np.repeat(np.asarray(ds.transcription), np.maximum(durs, 0))
    if ds.mel is not None:
        assert len(ext) == ds.mel.shape[0], (len(ext), ds.mel.shape[0])
    ds.additional["transcription_by_frames"] = ext.astype(np.int32)
    return ds
