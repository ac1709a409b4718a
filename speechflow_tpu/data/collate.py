"""Collate functions: variable-length samples -> fixed-shape padded batches.

Capability parity with the reference collate zoo
(speechflow/data_pipeline/collate_functions/): TTSCollate (transcription,
durations, mel, pitch/energy + aggregates, gate, speaker/lang ids, embeddings),
SpectrogramCollate, AudioCollate, ImageCollate.

TPU-first change: lengths are padded to *buckets* (multiples of
``token_multiple``/``frame_multiple``, default 16/64) so the jit'd train step
sees a small, bounded set of shapes instead of one shape per batch —
replacing the reference's free-form dynamic batching (``comb_by_len``).
"""

from __future__ import annotations

import typing as tp
from dataclasses import dataclass, field

import numpy as np

from speechflow_tpu.data.core.datasample import (
    AudioDataSample,
    ImageDataSample,
    SpectrogramDataSample,
    TTSDataSample,
)
from speechflow_tpu.utils.pad import round_up, stack_and_pad

__all__ = [
    "CollatedTTS", "CollatedSpectrogram", "CollatedAudio", "CollatedImage",
    "TTSCollate", "SpectrogramCollate", "AudioCollate", "ImageCollate", "COLLATES",
]


@dataclass
class CollatedAudio:
    waveform: np.ndarray = None            # (B, T)
    waveform_lengths: np.ndarray = None    # (B,)
    speaker_id: np.ndarray = None
    lang_id: np.ndarray = None
    speaker_emb: tp.Optional[np.ndarray] = None
    additional: tp.Dict[str, np.ndarray] = field(default_factory=dict)


@dataclass
class CollatedSpectrogram(CollatedAudio):
    mel: np.ndarray = None                 # (B, T, n_mels)
    mel_lengths: np.ndarray = None
    magnitude: tp.Optional[np.ndarray] = None
    energy: tp.Optional[np.ndarray] = None
    pitch: tp.Optional[np.ndarray] = None
    averages: tp.Optional[tp.Dict[str, np.ndarray]] = None  # name -> (B,)


@dataclass
class CollatedTTS(CollatedSpectrogram):
    transcription: np.ndarray = None       # (B, N)
    transcription_lengths: np.ndarray = None
    durations: tp.Optional[np.ndarray] = None
    gate: tp.Optional[np.ndarray] = None
    aggregate_pitch: tp.Optional[np.ndarray] = None
    aggregate_energy: tp.Optional[np.ndarray] = None
    ling_feat: tp.Optional[np.ndarray] = None
    lm_feat: tp.Optional[np.ndarray] = None
    xpbert_feat: tp.Optional[np.ndarray] = None
    prosody: tp.Optional[np.ndarray] = None


@dataclass
class CollatedImage:
    image: np.ndarray = None
    label_id: np.ndarray = None


def _ids(samples, attr, default=-1):
    return np.asarray(
        [getattr(s, attr, None) if getattr(s, attr, None) is not None else default for s in samples],
        dtype=np.int32,
    )


def _opt_stack(samples, attr, target_len=None, multiple=None):
    vals = [getattr(s, attr, None) for s in samples]
    if any(v is None for v in vals):
        return None, None
    return stack_and_pad(vals, multiple=multiple, target_len=target_len)


class AudioCollate:
    def __init__(self, sample_multiple: int = 256):
        self.sample_multiple = sample_multiple

    def __call__(self, samples: tp.List[AudioDataSample]) -> CollatedAudio:
        wavs = [s.audio_chunk.waveform for s in samples]
        waveform, lens = stack_and_pad(wavs, multiple=self.sample_multiple)
        out = CollatedAudio(
            waveform=waveform.astype(np.float32),
            waveform_lengths=lens,
            speaker_id=_ids(samples, "speaker_id"),
            lang_id=_ids(samples, "lang_id"),
        )
        emb, _ = _opt_stack(samples, "speaker_emb", target_len=None)
        if emb is None:
            embs = [getattr(s, "speaker_emb", None) for s in samples]
            if all(e is not None for e in embs):
                out.speaker_emb = np.stack(embs).astype(np.float32)
        else:
            out.speaker_emb = emb.astype(np.float32)
        return out


class SpectrogramCollate:
    def __init__(self, frame_multiple: int = 64, sample_multiple: int = 256):
        self.frame_multiple = frame_multiple
        self.sample_multiple = sample_multiple

    def __call__(self, samples: tp.List[SpectrogramDataSample]) -> CollatedSpectrogram:
        out = CollatedSpectrogram(
            speaker_id=_ids(samples, "speaker_id"),
            lang_id=_ids(samples, "lang_id"),
        )
        if samples[0].audio_chunk is not None and samples[0].audio_chunk.data is not None:
            out.waveform, out.waveform_lengths = stack_and_pad(
                [s.audio_chunk.waveform for s in samples], multiple=self.sample_multiple
            )
        t_mel = None
        if samples[0].mel is not None:
            out.mel, out.mel_lengths = stack_and_pad(
                [s.mel for s in samples], multiple=self.frame_multiple
            )
            t_mel = out.mel.shape[1]
        for attr in ("magnitude", "energy", "pitch"):
            arr, _ = _opt_stack(samples, attr, target_len=t_mel, multiple=self.frame_multiple)
            setattr(out, attr, arr)
        embs = [getattr(s, "speaker_emb", None) for s in samples]
        if all(e is not None for e in embs):
            out.speaker_emb = np.stack(embs).astype(np.float32)
        avgs = [getattr(s, "averages", None) for s in samples]
        if all(a is not None for a in avgs):
            keys = sorted(set().union(*[a.keys() for a in avgs]))
            out.averages = {
                k: np.asarray([a.get(k, 0.0) for a in avgs], np.float32) for k in keys
            }
        return out


class TTSCollate(SpectrogramCollate):
    def __init__(self, token_multiple: int = 16, frame_multiple: int = 64,
                 sample_multiple: int = 256):
        super().__init__(frame_multiple, sample_multiple)
        self.token_multiple = token_multiple

    def __call__(self, samples: tp.List[TTSDataSample]) -> CollatedTTS:
        base = super().__call__(samples)
        out = CollatedTTS(**base.__dict__)
        out.transcription, out.transcription_lengths = stack_and_pad(
            [s.transcription for s in samples], multiple=self.token_multiple
        )
        out.transcription = out.transcription.astype(np.int32)
        n_tok = out.transcription.shape[1]
        t_mel = out.mel.shape[1] if out.mel is not None else None

        dur, _ = _opt_stack(samples, "durations", target_len=n_tok)
        out.durations = dur
        for attr in ("aggregate_pitch", "aggregate_energy", "ling_feat", "lm_feat",
                     "xpbert_feat"):
            arr, _ = _opt_stack(samples, attr, target_len=n_tok)
            setattr(out, attr, arr)
        # prosody pads with -1 = "undefined" class, not class 0
        vals = [getattr(s, "prosody", None) for s in samples]
        if all(v is not None for v in vals):
            pros, _ = stack_and_pad(vals, pad_value=-1, target_len=n_tok)
            out.prosody = pros.astype(np.int32)
        # SSML modifiers live in ds.additional (token-level factors)
        for key in ("pitch_modifier", "volume_modifier", "rate_modifier"):
            vals = [s.additional.get(key) for s in samples]
            if all(v is not None for v in vals):
                out.additional[key], _ = stack_and_pad(vals, pad_value=1.0,
                                                       target_len=n_tok)
        gate, _ = _opt_stack(samples, "gate", target_len=t_mel)
        if gate is not None and t_mel is not None:
            # padding frames keep gate=1 so the stop head trains on them too
            pos = np.arange(t_mel)[None, :]
            gate = np.where(pos >= (out.mel_lengths[:, None] - 1), 1.0, gate)
        out.gate = gate
        return out


class ImageCollate:
    def __init__(self, label2id: tp.Optional[tp.Dict[str, int]] = None):
        self.label2id = label2id or {}

    def __call__(self, samples: tp.List[ImageDataSample]) -> CollatedImage:
        for s in samples:
            if s.label not in self.label2id:
                self.label2id[s.label] = len(self.label2id)
        return CollatedImage(
            image=np.stack([s.image for s in samples]).astype(np.float32),
            label_id=np.asarray([self.label2id[s.label] for s in samples], np.int32),
        )


class NoCollate:
    """Pass-through: batches carry raw DataSamples only (empty-config tests,
    dump scripts)."""

    def __call__(self, samples):
        return None


COLLATES = {
    "TTSCollate": TTSCollate,
    "SpectrogramCollate": SpectrogramCollate,
    "AudioCollate": AudioCollate,
    "ImageCollate": ImageCollate,
    "none": NoCollate,
}


class TTSCollateWithPrompt(TTSCollate):
    """Pairs each sample with a same-speaker prompt from the batch
    (reference: tts_collate.py:157 TTSCollateWithPrompt — neighbor samples
    become prompt/target for prompt-conditioned models)."""

    def __call__(self, samples):
        out = super().__call__(samples)
        # prompt index: another sample with the same speaker if present, else self
        spk = [getattr(s, "speaker_id", None) for s in samples]
        prompt_idx = []
        for i, sid in enumerate(spk):
            match = [j for j, sj in enumerate(spk) if sj == sid and j != i]
            prompt_idx.append(match[0] if match else i)
        idx = np.asarray(prompt_idx, np.int64)
        out.additional["prompt_index"] = idx.astype(np.int32)
        if out.mel is not None:
            out.additional["prompt_mel"] = out.mel[idx]
            out.additional["prompt_mel_lengths"] = out.mel_lengths[idx]
        out.additional["prompt_transcription"] = out.transcription[idx]
        return out


COLLATES["TTSCollateWithPrompt"] = TTSCollateWithPrompt
