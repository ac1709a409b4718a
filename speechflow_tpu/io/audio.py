"""Host-side audio IO container.

Capability parity with the reference ``AudioChunk`` (speechflow/io/audio_io.py:39):
lazy waveform loading with optional offset/duration, save / to_bytes, trim, pad,
pad-to-multiple, volume, resample, preemphasis, mu-law — implemented on
stdlib/scipy (no librosa/soundfile in this environment). All device-side DSP
lives in :mod:`speechflow_tpu.ops`; this class is deliberately CPU/numpy-only
(audio files are host-side artifacts).
"""

from __future__ import annotations

import io as _io
import math
import struct
import typing as tp
import wave
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import numpy.typing as npt
from scipy.io import wavfile as _wavfile
from scipy.signal import resample_poly as _resample_poly

__all__ = ["AudioChunk", "AudioFormat"]


class AudioFormat:
    WAV = "wav"
    OGG = "ogg"
    OPUS = "opus"
    SUPPORTED = (WAV, OGG, OPUS, "oga")

    @staticmethod
    def check(path: tp.Union[str, Path]) -> bool:
        return Path(path).suffix.lower().lstrip(".") in AudioFormat.SUPPORTED


def _to_float32(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.float32:
        return data
    if data.dtype == np.float64:
        return data.astype(np.float32)
    if data.dtype == np.int16:
        return (data / 32768.0).astype(np.float32)
    if data.dtype == np.int32:
        return (data / 2147483648.0).astype(np.float32)
    if data.dtype == np.uint8:
        return ((data.astype(np.float32) - 128.0) / 128.0).astype(np.float32)
    raise ValueError(f"unsupported wav dtype: {data.dtype}")


@dataclass
class AudioChunk:
    """Lazy audio container: (file_path | waveform) + [begin, end) window in seconds."""

    file_path: tp.Optional[tp.Union[str, Path]] = None
    data: tp.Optional[npt.NDArray[np.float32]] = None
    sr: tp.Optional[int] = None
    begin: float = 0.0
    end: tp.Optional[float] = None

    def __post_init__(self):
        if self.file_path is not None:
            self.file_path = Path(self.file_path)
        if self.data is not None:
            self.data = _to_float32(np.asarray(self.data))
            if self.data.ndim > 1:  # downmix to mono
                self.data = self.data.mean(axis=-1).astype(np.float32)

    # -- properties ----------------------------------------------------------

    @property
    def empty(self) -> bool:
        return self.data is None

    @property
    def duration(self) -> float:
        if self.data is not None and self.sr:
            return len(self.data) / self.sr
        if self.end is not None:
            return self.end - self.begin
        if self.file_path is not None:
            if Path(self.file_path).suffix.lower() == ".wav":
                return _wav_duration(self.file_path)
            return self.load().duration  # compressed formats: decode to know
        return 0.0

    @property
    def waveform(self) -> np.ndarray:
        if self.data is None:
            self.load()
        return self.data

    def __len__(self) -> int:
        return 0 if self.data is None else len(self.data)

    # -- IO -------------------------------------------------------------------

    def load(self, sr: tp.Optional[int] = None, dtype=np.float32) -> "AudioChunk":
        """Read the window [begin, end) from file; optionally resample to ``sr``.

        Formats: wav (scipy), ogg/vorbis and ogg/opus (system codec libs,
        io/codecs.py — reference AudioChunk loads these via soundfile,
        audio_io.py:39)."""
        if self.data is None:
            if self.file_path is None:
                raise ValueError("AudioChunk has neither data nor file_path")
            suffix = Path(self.file_path).suffix.lower()
            if suffix in (".ogg", ".opus", ".oga"):
                from speechflow_tpu.io import codecs

                codec = codecs.ogg_codec_of(self.file_path)
                if codec == "opus" or suffix == ".opus":
                    data, file_sr = codecs.read_ogg_opus(self.file_path)
                else:
                    data, file_sr = codecs.read_ogg_vorbis(self.file_path)
                data = _to_float32(np.atleast_1d(data))
            else:
                file_sr, data = _wavfile.read(str(self.file_path))
                data = _to_float32(np.atleast_1d(data))
            if data.ndim > 1:
                data = data.mean(axis=-1).astype(np.float32)
            b = int(round(self.begin * file_sr))
            e = len(data) if self.end is None else int(round(self.end * file_sr))
            data = data[b:e]
            self.data, self.sr = np.ascontiguousarray(data), file_sr
            if self.end is None:
                self.end = self.begin + len(data) / file_sr
        if sr is not None and sr != self.sr:
            self.resample(sr)
        if dtype is not None and self.data.dtype != dtype:
            self.data = self.data.astype(dtype)
        return self

    def save(self, path: tp.Union[str, Path], overwrite: bool = False) -> "AudioChunk":
        """Write by extension: .wav (PCM16), .ogg (vorbis), .opus (opus 48k)."""
        path = Path(path)
        if path.exists() and not overwrite:
            raise FileExistsError(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        pcm = np.clip(self.waveform, -1.0, 1.0)
        suffix = path.suffix.lower()
        if suffix in (".ogg", ".oga"):
            from speechflow_tpu.io import codecs

            codecs.write_ogg_vorbis(path, pcm, int(self.sr))
        elif suffix == ".opus":
            from speechflow_tpu.io import codecs

            codecs.write_ogg_opus(path, pcm, int(self.sr))
        else:
            _wavfile.write(str(path), int(self.sr), (pcm * 32767.0).astype(np.int16))
        return self

    def to_bytes(self) -> bytes:
        buf = _io.BytesIO()
        pcm = (np.clip(self.waveform, -1.0, 1.0) * 32767.0).astype(np.int16)
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(int(self.sr))
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    @staticmethod
    def from_bytes(blob: bytes) -> "AudioChunk":
        with wave.open(_io.BytesIO(blob), "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
            width = w.getsampwidth()
            ch = w.getnchannels()
        if width != 2:
            raise ValueError("only 16-bit PCM supported in from_bytes")
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
        if ch > 1:
            data = data.reshape(-1, ch).mean(axis=-1)
        return AudioChunk(data=data, sr=sr, end=len(data) / sr)

    # -- transforms (in place, chainable) --------------------------------------

    def copy(self) -> "AudioChunk":
        return AudioChunk(
            file_path=self.file_path,
            data=None if self.data is None else self.data.copy(),
            sr=self.sr, begin=self.begin, end=self.end,
        )

    def trim(self, begin: float = 0.0, end: tp.Optional[float] = None) -> "AudioChunk":
        wav = self.waveform
        b = int(round(begin * self.sr))
        e = len(wav) if end is None else int(round(end * self.sr))
        self.data = wav[b:e]
        self.end = self.begin + begin + len(self.data) / self.sr
        self.begin = self.begin + begin
        return self

    def pad(self, left_s: float = 0.0, right_s: float = 0.0) -> "AudioChunk":
        lw = int(round(left_s * self.sr))
        rw = int(round(right_s * self.sr))
        self.data = np.pad(self.waveform, (lw, rw))
        return self

    def multiple(self, hop: int, pad_value: float = 0.0) -> "AudioChunk":
        """Zero-pad so the length is a multiple of ``hop`` samples."""
        wav = self.waveform
        rem = (-len(wav)) % hop
        if rem:
            self.data = np.pad(wav, (0, rem), constant_values=pad_value)
        return self

    def volume(self, gain: float) -> "AudioChunk":
        self.data = (self.waveform * gain).astype(np.float32)
        return self

    def normalize(self, peak: float = 0.95) -> "AudioChunk":
        wav = self.waveform
        m = np.abs(wav).max()
        if m > 0:
            self.data = (wav * (peak / m)).astype(np.float32)
        return self

    def resample(self, sr: int) -> "AudioChunk":
        if self.sr == sr:
            return self
        g = math.gcd(int(sr), int(self.sr))
        self.data = _resample_poly(self.waveform, sr // g, self.sr // g).astype(np.float32)
        self.sr = sr
        return self

    def preemphasis(self, coeff: float = 0.97) -> "AudioChunk":
        wav = self.waveform
        self.data = np.concatenate([wav[:1], wav[1:] - coeff * wav[:-1]]).astype(np.float32)
        return self

    def mu_law_encode(self, mu: int = 255) -> np.ndarray:
        wav = np.clip(self.waveform, -1.0, 1.0)
        return (np.sign(wav) * np.log1p(mu * np.abs(wav)) / np.log1p(mu)).astype(np.float32)

    @staticmethod
    def mu_law_decode(enc: np.ndarray, mu: int = 255) -> np.ndarray:
        return (np.sign(enc) * ((1 + mu) ** np.abs(enc) - 1) / mu).astype(np.float32)


def _wav_duration(path: tp.Union[str, Path]) -> float:
    with wave.open(str(path), "rb") as w:
        return w.getnframes() / w.getframerate()
