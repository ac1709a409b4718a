"""DataSample hierarchy — the unit record flowing through the pipeline.

Capability parity with the reference DataSample
(speechflow/data_pipeline/core/datasample.py:242): a dataclass with uid/tag,
a ``transform_params`` provenance dict recording each handler's parameters
(the dump cache keys on it), and serialization. The torch-specific mixins
(ToTensor/MovableToDevice/Pinnable) are replaced by the JAX execution model:
samples hold numpy on host; device placement happens once per collated batch
in the loader (``jax.device_put``), so per-field tensor conversion is gone by
design.
"""

from __future__ import annotations

import hashlib
import typing as tp
from dataclasses import dataclass, field, fields

import numpy as np

from speechflow_tpu.io import AudioChunk, Serialize, Timestamps

__all__ = [
    "DataSample",
    "AudioDataSample",
    "SpectrogramDataSample",
    "TTSDataSample",
    "ImageDataSample",
]


@dataclass
class DataSample:
    file_path: tp.Optional[str] = None
    label: tp.Optional[str] = None
    tag: tp.Optional[str] = None
    index: int = 0
    transform_params: tp.Dict[str, dict] = field(default_factory=dict)
    additional: tp.Dict[str, tp.Any] = field(default_factory=dict)

    @property
    def uid(self) -> str:
        key = str(self.file_path or "") + "|" + str(self.label or "") + "|" + str(self.index)
        return hashlib.sha256(key.encode()).hexdigest()[:16]

    def field_names(self) -> tp.List[str]:
        return [f.name for f in fields(self)]

    def get(self, name: str, default=None):
        if hasattr(self, name):
            return getattr(self, name)
        return self.additional.get(name, default)

    def setdefaults(self, **kwargs) -> "DataSample":
        for k, v in kwargs.items():
            if getattr(self, k, None) is None:
                setattr(self, k, v)
        return self

    def get_param_val(self, name: str, default=None):
        """Look up a parameter recorded by any earlier handler (provenance)."""
        for params in self.transform_params.values():
            if name in params:
                return params[name]
        return default

    def serialize(self) -> bytes:
        return Serialize.dump(self)

    @staticmethod
    def deserialize(blob: bytes) -> "DataSample":
        return Serialize.load(blob)

    def copy(self) -> "DataSample":
        return Serialize.load(Serialize.dump(self))

    def __len__(self) -> int:
        return 1


@dataclass
class AudioDataSample(DataSample):
    audio_chunk: tp.Optional[AudioChunk] = None
    sample_rate: tp.Optional[int] = None
    speaker_name: tp.Optional[str] = None
    speaker_id: tp.Optional[int] = None
    lang: tp.Optional[str] = None
    lang_id: tp.Optional[int] = None
    speaker_emb: tp.Optional[np.ndarray] = None
    speech_quality_emb: tp.Optional[np.ndarray] = None
    ssl_feat: tp.Optional[np.ndarray] = None
    ac_feat: tp.Optional[np.ndarray] = None
    mu_law_waveform: tp.Optional[np.ndarray] = None

    @property
    def waveform(self) -> tp.Optional[np.ndarray]:
        return None if self.audio_chunk is None else self.audio_chunk.data


@dataclass
class SpectrogramDataSample(AudioDataSample):
    magnitude: tp.Optional[np.ndarray] = None  # (T, n_bins)
    mel: tp.Optional[np.ndarray] = None        # (T, n_mels)
    energy: tp.Optional[np.ndarray] = None     # (T,)
    pitch: tp.Optional[np.ndarray] = None      # (T,)
    spectral_flatness: tp.Optional[np.ndarray] = None
    hop_len: tp.Optional[int] = None
    averages: tp.Optional[tp.Dict[str, np.ndarray]] = None  # per-utterance scalars (average_by_time)
    ranges: tp.Optional[tp.Dict[str, np.ndarray]] = None    # per-attr (lo, hi, span) from normalize

    @property
    def n_frames(self) -> int:
        for feat in (self.mel, self.magnitude, self.energy, self.pitch):
            if feat is not None:
                return feat.shape[0]
        return 0


@dataclass
class TTSDataSample(SpectrogramDataSample):
    sega_path: tp.Optional[str] = None
    text: tp.Optional[str] = None
    phonemes: tp.Optional[tp.List[str]] = None
    transcription: tp.Optional[np.ndarray] = None       # (N,) token ids
    phoneme_timestamps: tp.Optional[Timestamps] = None
    word_timestamps: tp.Optional[Timestamps] = None
    durations: tp.Optional[np.ndarray] = None           # (N,) frames per token
    gate: tp.Optional[np.ndarray] = None                # (T,) stop target
    aggregate_pitch: tp.Optional[np.ndarray] = None     # (N,)
    aggregate_energy: tp.Optional[np.ndarray] = None    # (N,)
    ling_feat: tp.Optional[np.ndarray] = None           # (N, F) linguistic features
    lm_feat: tp.Optional[np.ndarray] = None             # word-level LM embeddings
    xpbert_feat: tp.Optional[np.ndarray] = None         # (N, D) phoneme-level LM embeddings
    word_lengths: tp.Optional[np.ndarray] = None        # tokens per word
    prosody: tp.Optional[np.ndarray] = None             # (N,) prosody class per token
    intonation_type: tp.Optional[str] = None
    # word-level parser tiers from TextGridStage3 (producers for ling_feat;
    # reference keeps these on the Doc/Token objects)
    pos_tags: tp.Optional[tp.List[str]] = None
    syntax_rels: tp.Optional[tp.List[str]] = None
    word_ids: tp.Optional[tp.List[str]] = None
    head_ids: tp.Optional[tp.List[str]] = None
    emphasis_labels: tp.Optional[tp.List[str]] = None
    prosody_labels: tp.Optional[tp.List[str]] = None
    syntagma_ids: tp.Optional[tp.List[int]] = None

    @property
    def n_tokens(self) -> int:
        return 0 if self.transcription is None else len(self.transcription)


@dataclass
class ImageDataSample(DataSample):
    image: tp.Optional[np.ndarray] = None


@dataclass
class ProsodyPredictionDataSample(DataSample):
    """Word-level prosody prediction sample (reference
    ProsodyPredictionDataSample, data_types.py — token ids + per-token binary
    and category targets; -1 marks positions excluded from the loss)."""

    words: tp.Optional[tp.List[str]] = None
    token_ids: tp.Optional[np.ndarray] = None   # (N,) tokenizer ids
    binary: tp.Optional[np.ndarray] = None      # (N,) 0/1 has-contour, -1 pad
    category: tp.Optional[np.ndarray] = None    # (N,) contour class, -1 pad
