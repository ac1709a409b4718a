"""Dataset-level singleton handlers: state computed once over the whole
dataset, applied per-sample, shipped to workers, merged across servers.

Capability parity with the reference tts_singletons
(speechflow/data_pipeline/datasample_processors/tts_singletons.py:42,368,408,450,621):
SpeakerIDSetter (lang/speaker -> id maps with resume-from-checkpoint remap),
StatisticsRange (per-speaker feature ranges for variance denormalization),
MeanBioEmbeddings, DatasetStatistics (max lens/durations), PhonemeStatistics
(alphabet source). Each exposes fit()/apply()/state_dict()/aggregate().
"""

from __future__ import annotations

import typing as tp

import numpy as np

from speechflow_tpu.data.core.dataset import Dataset
from speechflow_tpu.data.core.datasample import TTSDataSample
from speechflow_tpu.data.core.singleton import Singleton

__all__ = [
    "SpeakerIDSetter", "StatisticsRange", "DatasetStatistics",
    "PhonemeStatistics", "MeanBioEmbeddings", "SINGLETON_HANDLERS",
]


class BaseSingleton(metaclass=Singleton):
    def fit(self, dataset: Dataset) -> "BaseSingleton":
        raise NotImplementedError

    def apply(self, ds):
        return ds

    def state_dict(self) -> dict:
        raise NotImplementedError

    def load_state_dict(self, d: dict) -> None:
        raise NotImplementedError

    def aggregate(self, other: "BaseSingleton") -> "BaseSingleton":
        return self


class SpeakerIDSetter(BaseSingleton):
    def __init__(self, resume_from: tp.Optional[dict] = None,
                 min_samples: int = 0):
        self.speaker2id: tp.Dict[str, int] = {}
        self.lang2id: tp.Dict[str, int] = {}
        self.min_samples = min_samples
        if resume_from:
            self.load_state_dict(resume_from)

    def fit(self, dataset: Dataset) -> "SpeakerIDSetter":
        counts: tp.Dict[str, int] = {}
        langs: tp.Set[str] = set()
        for ds in dataset:
            if getattr(ds, "speaker_name", None):
                counts[ds.speaker_name] = counts.get(ds.speaker_name, 0) + 1
            if getattr(ds, "lang", None):
                langs.add(ds.lang)
        for name in sorted(counts):
            if counts[name] >= self.min_samples and name not in self.speaker2id:
                self.speaker2id[name] = len(self.speaker2id)
        for lang in sorted(langs):
            if lang not in self.lang2id:
                self.lang2id[lang] = len(self.lang2id)
        return self

    def apply(self, ds: TTSDataSample) -> TTSDataSample:
        if getattr(ds, "speaker_name", None) is not None:
            ds.speaker_id = self.speaker2id.get(ds.speaker_name)
        if getattr(ds, "lang", None) is not None:
            ds.lang_id = self.lang2id.get(ds.lang)
        return ds

    @property
    def n_speakers(self) -> int:
        return len(self.speaker2id)

    @property
    def n_langs(self) -> int:
        return len(self.lang2id)

    def state_dict(self) -> dict:
        return {"speaker2id": dict(self.speaker2id), "lang2id": dict(self.lang2id)}

    def load_state_dict(self, d: dict) -> None:
        self.speaker2id = dict(d["speaker2id"])
        self.lang2id = dict(d["lang2id"])

    def aggregate(self, other: "SpeakerIDSetter") -> "SpeakerIDSetter":
        for name in sorted(other.speaker2id):
            if name not in self.speaker2id:
                self.speaker2id[name] = len(self.speaker2id)
        for lang in sorted(other.lang2id):
            if lang not in self.lang2id:
                self.lang2id[lang] = len(self.lang2id)
        return self


class StatisticsRange(BaseSingleton):
    """Per-speaker {feature: (min, max, mean, std)} for denormalization.

    Ranges depend on post-preproc features, so at parse time ``fit`` usually
    sees nothing — the dump script (scripts/dump.py) computes and saves
    ``ranges.json`` (the reference's file of the same name) which this
    singleton loads via ``ranges_file``.
    """

    FEATURES = ("pitch", "energy", "aggregate_pitch", "aggregate_energy")

    def __init__(self, ranges_file: tp.Optional[str] = None):
        self.ranges: tp.Dict[str, tp.Dict[str, tp.Tuple[float, float, float, float]]] = {}
        if ranges_file:
            import json
            from pathlib import Path

            if Path(ranges_file).exists():
                self.ranges = json.loads(Path(ranges_file).read_text())

    def fit(self, dataset: Dataset) -> "StatisticsRange":
        if self.ranges:
            return self  # loaded from ranges.json
        acc: tp.Dict[tp.Tuple[str, str], tp.List[np.ndarray]] = {}
        for ds in dataset:
            spk = getattr(ds, "speaker_name", None) or "__all__"
            for feat in self.FEATURES:
                val = getattr(ds, feat, None)
                if val is not None:
                    v = np.asarray(val).ravel()
                    v = v[v != 0] if "pitch" in feat else v
                    if len(v):
                        acc.setdefault((spk, feat), []).append(v)
        for (spk, feat), chunks in acc.items():
            v = np.concatenate(chunks)
            self.ranges.setdefault(spk, {})[feat] = (
                float(np.quantile(v, 0.01)), float(np.quantile(v, 0.99)),
                float(v.mean()), float(v.std()),
            )
        return self

    def get(self, feature: str, speaker: tp.Optional[str] = None) -> tp.Tuple[float, float, float, float]:
        spk = speaker if speaker in self.ranges else "__all__"
        if spk not in self.ranges and self.ranges:
            spk = next(iter(self.ranges))
        entry = self.ranges.get(spk, {}).get(feature)
        return entry or (0.0, 1.0, 0.0, 1.0)

    def as_arrays(self, feature: str, speaker2id: tp.Dict[str, int]) -> np.ndarray:
        """(n_speakers, 4) table indexable by speaker_id on device."""
        out = np.zeros((max(len(speaker2id), 1), 4), dtype=np.float32)
        for name, sid in speaker2id.items():
            out[sid] = self.get(feature, name)
        return out

    def state_dict(self) -> dict:
        return {"ranges": self.ranges}

    def load_state_dict(self, d: dict) -> None:
        self.ranges = d["ranges"]

    def aggregate(self, other: "StatisticsRange") -> "StatisticsRange":
        for spk, feats in other.ranges.items():
            self.ranges.setdefault(spk, {}).update(feats)
        return self


class DatasetStatistics(BaseSingleton):
    def __init__(self):
        self.max_transcription_length = 0
        self.max_frames = 0
        self.max_audio_duration = 0.0
        self.total_duration = 0.0
        self.n_samples = 0
        self.speaker_durations: tp.Dict[str, float] = {}

    def fit(self, dataset: Dataset) -> "DatasetStatistics":
        for ds in dataset:
            self.n_samples += 1
            tr = getattr(ds, "transcription", None)
            if tr is not None:
                self.max_transcription_length = max(self.max_transcription_length, len(tr))
            nf = getattr(ds, "n_frames", 0)
            self.max_frames = max(self.max_frames, nf or 0)
            ac = getattr(ds, "audio_chunk", None)
            if ac is not None:
                dur = ac.duration
                self.max_audio_duration = max(self.max_audio_duration, dur)
                self.total_duration += dur
                spk = getattr(ds, "speaker_name", None) or "__all__"
                self.speaker_durations[spk] = self.speaker_durations.get(spk, 0.0) + dur
        return self

    def state_dict(self) -> dict:
        return dict(self.__dict__)

    def load_state_dict(self, d: dict) -> None:
        self.__dict__.update(d)

    def aggregate(self, other: "DatasetStatistics") -> "DatasetStatistics":
        self.max_transcription_length = max(self.max_transcription_length, other.max_transcription_length)
        self.max_frames = max(self.max_frames, other.max_frames)
        self.max_audio_duration = max(self.max_audio_duration, other.max_audio_duration)
        self.total_duration += other.total_duration
        self.n_samples += other.n_samples
        for k, v in other.speaker_durations.items():
            self.speaker_durations[k] = self.speaker_durations.get(k, 0.0) + v
        return self


class PhonemeStatistics(BaseSingleton):
    def __init__(self):
        self.counts: tp.Dict[str, int] = {}

    def fit(self, dataset: Dataset) -> "PhonemeStatistics":
        for ds in dataset:
            phs = getattr(ds, "phonemes", None)
            if not phs and getattr(ds, "text", None):
                # text-only corpora (annotator stage-1 .TextGrid files carry
                # only a word tier): count the default phonemization so the
                # alphabet covers what the `phonemize` handler will emit
                from speechflow_tpu.data.processors.text import phonemize_words

                phs, _ = phonemize_words(ds.text, lang=getattr(ds, "lang", None) or "EN")
            for p in phs or ():
                key = p if p else "<SIL>"
                self.counts[key] = self.counts.get(key, 0) + 1
        return self

    @property
    def symbols(self) -> tp.List[str]:
        return sorted(self.counts)

    def state_dict(self) -> dict:
        return {"counts": dict(self.counts)}

    def load_state_dict(self, d: dict) -> None:
        self.counts = dict(d["counts"])

    def aggregate(self, other: "PhonemeStatistics") -> "PhonemeStatistics":
        for k, v in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + v
        return self


class MeanBioEmbeddings(BaseSingleton):
    """Per-speaker mean of speaker embeddings (reference: :408)."""

    def __init__(self):
        self.mean_emb: tp.Dict[str, np.ndarray] = {}

    def fit(self, dataset: Dataset) -> "MeanBioEmbeddings":
        acc: tp.Dict[str, list] = {}
        for ds in dataset:
            emb = getattr(ds, "speaker_emb", None)
            if emb is not None:
                acc.setdefault(ds.speaker_name or "__all__", []).append(np.asarray(emb))
        for spk, embs in acc.items():
            self.mean_emb[spk] = np.mean(np.stack(embs), axis=0)
        return self

    def apply(self, ds) -> tp.Any:
        if getattr(ds, "speaker_emb", None) is None and ds.speaker_name in self.mean_emb:
            ds.speaker_emb = self.mean_emb[ds.speaker_name]
        return ds

    def state_dict(self) -> dict:
        return {"mean_emb": {k: v.tolist() for k, v in self.mean_emb.items()}}

    def load_state_dict(self, d: dict) -> None:
        self.mean_emb = {k: np.asarray(v, np.float32) for k, v in d["mean_emb"].items()}

    def aggregate(self, other: "MeanBioEmbeddings") -> "MeanBioEmbeddings":
        self.mean_emb.update(other.mean_emb)
        return self


SINGLETON_HANDLERS = {
    "SpeakerIDSetter": SpeakerIDSetter,
    "StatisticsRange": StatisticsRange,
    "DatasetStatistics": DatasetStatistics,
    "PhonemeStatistics": PhonemeStatistics,
    "MeanBioEmbeddings": MeanBioEmbeddings,
}
