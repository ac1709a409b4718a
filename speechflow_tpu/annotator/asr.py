"""ASR services for dataset annotation.

Capability parity with the reference transcription step
(annotator/audio_transcription.py:67, asr_services/openai_asr.py:25): produce
``.whisper`` JSON files ({"text", "timestamps": [[word, begin, end], ...]})
next to each audio file. Backends: ``WhisperASR`` (HF transformers Whisper,
loaded lazily — requires local weights in this zero-egress environment),
``FileASR`` (reads existing .whisper files — also how downstream steps consume
step-0 output), or any callable injected behind ``ASRBase``.
"""

from __future__ import annotations

import json
import typing as tp
from pathlib import Path

import numpy as np

from speechflow_tpu.io import AudioChunk

__all__ = ["ASRBase", "FileASR", "WhisperASR", "CTCPhonemeASR", "run_audio_transcription"]


class ASRBase:
    def transcribe(self, audio: AudioChunk) -> dict:
        """-> {"text": str, "timestamps": [[word, begin_s, end_s], ...]}"""
        raise NotImplementedError

    def __call__(self, path: tp.Union[str, Path]) -> dict:
        return self.transcribe(AudioChunk(file_path=path).load())


class FileASR(ASRBase):
    """Reads pre-computed .whisper sidecar files (reference format:
    {"text": ..., "timestamps": [[word, b, e], ...]})."""

    def __call__(self, path: tp.Union[str, Path]) -> dict:
        side = Path(path).with_suffix(".whisper")
        data = json.loads(side.read_text(encoding="utf-8"))
        return data

    def transcribe(self, audio: AudioChunk) -> dict:
        return self(audio.file_path)


class WhisperASR(ASRBase):
    """HF Whisper (lazy). Word timestamps via the model's cross-attention
    alignment when available; sentence-level otherwise."""

    def __init__(self, model_name: str = "openai/whisper-small", device: str = "cpu"):
        self.model_name = model_name
        self.device = device
        self._pipe = None

    def _load(self):
        if self._pipe is None:
            from transformers import pipeline

            self._pipe = pipeline(
                "automatic-speech-recognition", model=self.model_name,
                device=-1 if self.device == "cpu" else 0,
                return_timestamps="word")
        return self._pipe

    def transcribe(self, audio: AudioChunk) -> dict:
        pipe = self._load()
        audio = audio.copy().resample(16000)
        out = pipe({"raw": np.asarray(audio.waveform), "sampling_rate": 16000})
        stamps = [[c["text"].strip(), float(c["timestamp"][0] or 0.0),
                   float(c["timestamp"][1] or audio.duration)]
                  for c in out.get("chunks", [])]
        return {"text": out["text"].strip(), "timestamps": stamps}


def convert_media_to_opus(
    data_root: tp.Union[str, Path],
    ext: str = ".wav",
    sr: tp.Optional[int] = None,
    overwrite: bool = False,
) -> tp.List[Path]:
    """Re-encode every ``ext`` file under ``data_root`` as Ogg/Opus beside the
    original — the annotator's media->opus conversion convenience (reference:
    annotator/audio_transcription.py media conversion via pydub/ffmpeg).
    Returns the written paths."""
    from speechflow_tpu.io import AudioChunk, construct_file_list

    out = []
    for f in construct_file_list(data_root, ext=ext):
        dst = Path(f).with_suffix(".opus")
        if dst.exists() and not overwrite:
            out.append(dst)
            continue
        chunk = AudioChunk(file_path=f).load(sr=sr)
        chunk.save(dst, overwrite=True)
        out.append(dst)
    return out


def run_audio_transcription(
    data_root: tp.Union[str, Path],
    asr: tp.Optional[ASRBase] = None,
    ext: str = ".wav",
    n_processes: int = 0,
    overwrite: bool = False,
) -> int:
    """Step 0: write a .whisper JSON next to every audio file; returns count."""
    from speechflow_tpu.io import construct_file_list

    asr = asr or WhisperASR()
    files = construct_file_list(data_root, ext=ext)
    done = 0
    for f in files:
        side = Path(f).with_suffix(".whisper")
        if side.exists() and not overwrite:
            done += 1
            continue
        result = asr(f)
        side.write_text(json.dumps(result, ensure_ascii=False, indent=2), encoding="utf-8")
        done += 1
    return done


class CTCPhonemeASR(ASRBase):
    """In-framework recognizer: the trainable CTC phoneme model
    (models/asr/ctc_model.py) behind the ASR interface. Emits phoneme-level
    tokens with frame timestamps — enough for the annotator's alignment
    bootstrap when no external Whisper weights exist. ``id_to_symbol`` maps
    label ids back to phoneme strings (the TTS alphabet)."""

    def __init__(self, model_ckpt: tp.Union[str, Path],
                 id_to_symbol: tp.Optional[tp.Mapping[int, str]] = None):
        from speechflow_tpu.models.asr import CTCRecognizer, CTCRecognizerParams
        from speechflow_tpu.utils.state_io import load_module

        self.model, self.params = load_module(
            CTCRecognizer, CTCRecognizerParams, model_ckpt)
        self.id_to_symbol = dict(id_to_symbol or {})

    #: long-audio chunking: fixed windows share one jit compile; each window's
    #: edges are overlap that the neighbouring window owns (reference: the
    #: cloud ASR services chunk long audiobook files the same way,
    #: asr_services/cloud_asr.py:30)
    chunk_s: float = 20.0
    overlap_s: float = 0.5

    def _decode_window(self, wav: np.ndarray, sr: int):
        import jax.numpy as jnp

        from speechflow_tpu.models.asr import greedy_ctc_decode

        logits = np.asarray(self.model.recognize(jnp.asarray(wav[None])))[0]
        hop_s = self.params.hop_length * self.params.time_stride / sr
        ids, spans = greedy_ctc_decode(logits, hop_s=hop_s)
        tokens = [self.id_to_symbol.get(int(i), str(int(i))) for i in ids]
        return [(tok, float(b), float(e)) for tok, (b, e) in zip(tokens, spans)]

    def transcribe(self, audio: AudioChunk) -> dict:
        sr = self.params.sample_rate
        chunk = audio if audio.sr == sr else audio.resample(sr)
        wav = np.asarray(chunk.waveform, np.float32)
        win = int(self.chunk_s * sr)
        if len(wav) <= win:
            stamps = self._decode_window(wav, sr)
        else:
            ov = int(self.overlap_s * sr)
            step = win - 2 * ov
            stamps = []
            start = 0
            while start < len(wav):
                piece = wav[start: start + win]
                if len(piece) < win:  # zero-pad the tail to the shared shape
                    piece = np.pad(piece, (0, win - len(piece)))
                core_lo = 0.0 if start == 0 else self.overlap_s
                core_hi = (self.chunk_s - self.overlap_s
                           if start + win < len(wav) else self.chunk_s)
                ofs = start / sr
                for tok, b, e in self._decode_window(piece, sr):
                    mid = 0.5 * (b + e)
                    if core_lo <= mid < core_hi:  # window owns this token
                        stamps.append((tok, ofs + b, ofs + e))
                start += step
        return {
            "text": " ".join(t for t, _, _ in stamps),
            "timestamps": [[tok, b, e] for tok, b, e in stamps],
        }
