"""Dataset parsers: file lists -> DataSamples.

Capability parity with the reference parser zoo
(speechflow/data_pipeline/dataset_parsers/): TTSDSParser reads TextGrid segas
(lang/speaker meta, phoneme/word tiers, duration & phoneme-length filters),
AudioDSParser wraps raw audio files, SimpleDSParser wraps any file list,
EasyDSParser runs an arbitrary function over a file list in N processes,
ImageDSParser reads image arrays, LibriSpeechDSParser reads MFA alignment
grids from the LibriSpeech-Alignments layout, ProsodyParser turns
TextGridStage3 prosody tiers into word-level prediction samples.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import numpy as np

from speechflow_tpu.data.core.datasample import (
    AudioDataSample,
    DataSample,
    ImageDataSample,
    SpectrogramDataSample,
    TTSDataSample,
)
from speechflow_tpu.data.core.parser import BaseDSParser, Metadata
from speechflow_tpu.io import AudioChunk, AudioSeg, Timestamps

__all__ = ["TTSDSParser", "AudioDSParser", "SimpleDSParser", "EasyDSParser",
           "ImageDSParser", "LibriSpeechDSParser", "ProsodyParser",
           "prosody_targets", "PARSERS"]


class TTSDSParser(BaseDSParser):
    def __init__(
        self,
        max_duration: tp.Optional[float] = None,
        min_duration: tp.Optional[float] = None,
        max_phoneme_length: tp.Optional[float] = None,
        audio_strip: bool = False,
        audio_strip_pad: float = 0.0,
        languages: tp.Optional[tp.Sequence[str]] = None,
        speakers: tp.Optional[tp.Sequence[str]] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.max_duration = max_duration
        self.min_duration = min_duration
        self.max_phoneme_length = max_phoneme_length
        self.audio_strip = audio_strip
        self.audio_strip_pad = audio_strip_pad
        self.languages = set(languages) if languages else None
        self.speakers = set(speakers) if speakers else None

    def reader(self, path: tp.Union[str, Path]) -> tp.List[Metadata]:
        seg = AudioSeg.load(path)
        return [{"seg": seg, "path": str(path)}]

    def run_preprocessing(self, md: Metadata) -> tp.Optional[Metadata]:
        seg: AudioSeg = md["seg"]
        if self.languages and seg.lang not in self.languages:
            return None
        if self.speakers and seg.speaker_name not in self.speakers:
            return None
        dur = seg.duration
        if self.max_duration and dur > self.max_duration:
            return None
        if self.min_duration and dur < self.min_duration:
            return None
        if self.max_phoneme_length:
            # anomalously long PHONEMES only — pauses (empty/SIL labels) may
            # legitimately be long (reference check_phoneme_length measures
            # ts_by_phonemes, the word-grouped real phonemes;
            # tts_ds_parser.py:218-226)
            lens = [e - b for b, e, lab in seg.phonemes()
                    if lab and lab not in ("<SIL>", "undefined_sil")]
            if lens and max(lens) > self.max_phoneme_length:
                return None
        return super().run_preprocessing(md)

    def to_datasample(self, md: Metadata) -> tp.Optional[TTSDataSample]:
        seg: AudioSeg = md["seg"]
        phs = seg.phonemes()
        words = seg.words()
        chunk = seg.audio_chunk
        if self.audio_strip and words:
            b, e = seg.bos_eos_bounds()
            # reference TTSDSParser audio_strip keeps `pad` seconds of context
            # on each side (2stage/data_stage1.yml pad 0.25, stage2 pad 0.15)
            b = max(b - self.audio_strip_pad, 0.0)
            e = min(e + self.audio_strip_pad, seg.duration)
            chunk = AudioChunk(
                file_path=chunk.file_path,
                begin=chunk.begin + b,
                end=chunk.begin + e,
            )
            phs = [(pb - b, pe - b, lab) for pb, pe, lab in phs if pe > b and pb < e]
            words = [(wb - b, we - b, lab) for wb, we, lab in words]
        ds = TTSDataSample(
            file_path=md["path"],
            sega_path=md["path"],
            label=seg.speaker_name,
            audio_chunk=chunk,
            lang=seg.lang,
            speaker_name=seg.speaker_name,
            text=" ".join(lab for _, _, lab in words),
            phonemes=[lab for _, _, lab in phs],
            phoneme_timestamps=Timestamps(np.asarray([[b, e] for b, e, _ in phs]))
            if phs else None,
            word_timestamps=Timestamps(np.asarray([[b, e] for b, e, _ in words]))
            if words else None,
            intonation_type="." if not seg.text_ends_with("?") else "?",
            # word-level parser tiers (real POS/syntax/emphasis/prosody from
            # the text parser, carried in TextGridStage3) feed add_ling_feat
            pos_tags=seg.word_tier_labels("pos"),
            syntax_rels=seg.word_tier_labels("rel"),
            word_ids=seg.word_tier_labels("id"),
            head_ids=seg.word_tier_labels("head_id"),
            emphasis_labels=seg.word_tier_labels("emphasis"),
            prosody_labels=seg.word_tier_labels("prosody"),
            syntagma_ids=seg.word_syntagma_ids(),
        )
        return ds


def _seg_text_ends_with(seg: AudioSeg, suffix: str) -> bool:
    words = seg.words()
    return bool(words) and words[-1][2].strip().endswith(suffix)


# small helper exposed on AudioSeg for parser use
AudioSeg.text_ends_with = _seg_text_ends_with  # type: ignore[attr-defined]


class AudioDSParser(BaseDSParser):
    def reader(self, path):
        return [{"path": str(path)}]

    @staticmethod
    def speaker_from_path(p: Path) -> str:
        """First ancestor dir that isn't a numeric chunk / generic name
        (datasets shard utterances into 000/001/... and wavs/ subdirs)."""
        for parent in p.parents:
            name = parent.name
            if name and not name.isdigit() and name.lower() not in ("wavs", "wav", "audio"):
                return name
        return p.parent.name

    def to_datasample(self, md: Metadata) -> AudioDataSample:
        p = Path(md["path"])
        speaker = self.speaker_from_path(p)
        # SpectrogramDataSample (an AudioDataSample with spectral fields all
        # None) so audio pipelines can use spectral handlers — e.g. the NSF
        # vocoder recipes compute frame-level pitch on raw-audio corpora
        return SpectrogramDataSample(
            file_path=str(p),
            label=speaker,
            speaker_name=speaker,
            audio_chunk=AudioChunk(file_path=p),
        )


class SimpleDSParser(BaseDSParser):
    def reader(self, path):
        return [{"path": str(path)}]

    def to_datasample(self, md: Metadata) -> DataSample:
        return DataSample(file_path=md["path"], label=Path(md["path"]).parent.name)


class ImageDSParser(BaseDSParser):
    def reader(self, path):
        return [{"path": str(path)}]

    def to_datasample(self, md: Metadata) -> ImageDataSample:
        arr = np.load(md["path"]) if md["path"].endswith(".npy") else None
        return ImageDataSample(file_path=md["path"], image=arr,
                               label=Path(md["path"]).parent.name)


class EasyDSParser(BaseDSParser):
    """Run an arbitrary fn over a file list in N processes
    (reference: easy_ds_parser.py:18 — used by the annotator for ASR)."""

    def __init__(self, fn: tp.Callable[[str], tp.Any], **kwargs):
        super().__init__(**kwargs)
        self.fn = fn

    def reader(self, path):
        return [{"path": str(path)}]

    def to_datasample(self, md: Metadata):
        out = self.fn(md["path"])
        if isinstance(out, DataSample):
            return out
        if out is None:
            return None
        return DataSample(file_path=md["path"], additional={"result": out})


class LibriSpeechDSParser(BaseDSParser):
    """Parse LibriSpeech-Alignments MFA TextGrids (``words``+``phones``
    tiers) into TTSDataSamples (reference LibriSpeechDSParser,
    dataset_parsers/librispeech_ds_parser.py:21).

    Per word interval, the covered ``phones`` entries become the word's
    phonemes (``spn`` -> ``<UNK>``, reference :85); silence entries between
    words are dropped — the pipeline's ``add_pauses_from_timestamps`` handler
    reinserts pauses where the timestamps show real gaps. Audio resolves to
    the sibling ``.flac``/``.wav`` with any ``-align`` path component removed
    (reference :95); speaker is the LibriSpeech ``speaker/chapter/utt`` layout's
    top directory.
    """

    #: phones-tier labels that mark silence, not speech
    SIL_LABELS = frozenset({"", "sil", "sp", "spn_sil", "<eps>"})

    def __init__(self, max_duration: tp.Optional[float] = None,
                 min_duration: tp.Optional[float] = None, **kwargs):
        super().__init__(**kwargs)
        self.max_duration = max_duration
        self.min_duration = min_duration

    def reader(self, path: tp.Union[str, Path]) -> tp.List[Metadata]:
        from speechflow_tpu.io import TextGrid

        grid = TextGrid.load(path)
        return [{"grid": grid, "path": str(path)}]

    @staticmethod
    def resolve_audio(grid_path: Path) -> tp.Optional[Path]:
        base = Path(str(grid_path).replace("-align", ""))
        for suffix in (".flac", ".wav"):
            p = base.with_suffix(suffix)
            if p.exists():
                return p
        return None

    def to_datasample(self, md: Metadata) -> tp.Optional[TTSDataSample]:
        from speechflow_tpu.io import TextGrid

        grid: TextGrid = md["grid"]
        path = Path(md["path"])
        if "words" not in grid or "phones" not in grid:
            return None
        words = [(b, e, lab) for b, e, lab in grid["words"].intervals if lab]
        phones = [(b, e, lab) for b, e, lab in grid["phones"].intervals
                  if lab.lower() not in self.SIL_LABELS]
        if not words or not phones:
            return None
        dur = grid.xmax - grid.xmin
        if self.max_duration and dur > self.max_duration:
            return None
        if self.min_duration and dur < self.min_duration:
            return None

        eps = 1e-4
        phonemes: tp.List[str] = []
        ph_ts: tp.List[tp.Tuple[float, float]] = []
        word_lengths: tp.List[int] = []
        for wb, we, _ in words:
            n = 0
            for pb, pe, lab in phones:
                if pb >= wb - eps and pe <= we + eps:
                    phonemes.append("<UNK>" if lab == "spn" else lab)
                    ph_ts.append((pb, pe))
                    n += 1
            if n == 0:
                return None  # word without phones: mis-parsed grid
            word_lengths.append(n)
        audio = self.resolve_audio(path)
        if audio is None:
            return None
        # speaker/chapter/utt.TextGrid layout
        speaker = path.parent.parent.name if path.parent.parent.name else path.parent.name
        return TTSDataSample(
            file_path=str(path),
            sega_path=str(path),
            label=speaker,
            speaker_name=speaker,
            lang="EN",
            audio_chunk=AudioChunk(file_path=audio),
            text=" ".join(lab for _, _, lab in words),
            phonemes=phonemes,
            phoneme_timestamps=Timestamps(np.asarray(ph_ts)),
            word_timestamps=Timestamps(np.asarray([[b, e] for b, e, _ in words])),
            word_lengths=np.asarray(word_lengths, np.int32) if word_lengths else None,
        )


def prosody_targets(words: tp.Sequence[str],
                    prosody_labels: tp.Optional[tp.Sequence[str]],
                    n_classes: int = 8) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Word-level prosody tier labels -> (binary, category) int32 targets.

    Empty / ``undefined`` / ``no`` labels are class-less words (binary 0);
    numeric labels are contour ids from the dump script's clustering
    (binary 1, category ``int(label) % n_classes``). Shared by ProsodyParser
    and the train_prosody loader so both emit identical targets.
    """
    binary = np.zeros(len(words), np.int32)
    category = np.full(len(words), -1, np.int32)
    for k in range(len(words)):
        lab = (prosody_labels[k] if prosody_labels else
               ("1" if words[k][-1:] in ",.?!" else "undefined"))
        if lab in ("", "undefined", "no"):
            binary[k] = 0
        else:
            binary[k] = 1
            try:
                category[k] = int(lab) % n_classes
            except ValueError:
                category[k] = 0
    return binary, category


class ProsodyParser(BaseDSParser):
    """TextGridStage3 segas -> word-level prosody-prediction samples
    (reference ProsodyParser, dataset_parsers/prosody_ds_parser.py: sega ->
    tokens + per-token prosody labels; the reference tokenizes with an HF
    tokenizer inside the parser — here token ids are hash-vocabulary by
    default and a trained WordLM vocab can be plugged in, matching the
    prosody model's two tokenizer modes)."""

    def __init__(self, vocab_size: int = 8000,
                 vocab: tp.Optional[tp.Dict[str, int]] = None,
                 n_classes: int = 8, **kwargs):
        super().__init__(**kwargs)
        self.vocab_size = vocab_size
        self.vocab = vocab
        self.n_classes = n_classes

    def reader(self, path: tp.Union[str, Path]) -> tp.List[Metadata]:
        seg = AudioSeg.load(path)
        return [{"seg": seg, "path": str(path)}]

    def to_datasample(self, md: Metadata):
        from speechflow_tpu.data.core.datasample import ProsodyPredictionDataSample
        from speechflow_tpu.models.prosody.interface import hash_tokenize

        seg: AudioSeg = md["seg"]
        words = [lab for _, _, lab in seg.words()]
        if not words:
            return None
        prosody = None
        if "prosody" in seg.grid:
            labels = seg.grid["prosody"].non_empty().labels
            prosody = labels if len(labels) == len(words) else None
        binary, category = prosody_targets(words, prosody, self.n_classes)
        if self.vocab is not None:
            ids = np.asarray([self.vocab.get(w.lower(), 0) for w in words], np.int32)
        else:
            ids = hash_tokenize(words, self.vocab_size)
        return ProsodyPredictionDataSample(
            file_path=md["path"], label=seg.speaker_name, words=words,
            token_ids=ids, binary=binary, category=category)


PARSERS = {
    "TTSDSParser": TTSDSParser,
    "AudioDSParser": AudioDSParser,
    "SimpleDSParser": SimpleDSParser,
    "ImageDSParser": ImageDSParser,
    "EasyDSParser": EasyDSParser,
    "LibriSpeechDSParser": LibriSpeechDSParser,
    "ProsodyParser": ProsodyParser,
}
