"""Waveform handlers (reference SignalProcessor,
speechflow/data_pipeline/datasample_processors/audio_processors.py:57)."""

from __future__ import annotations

import typing as tp

import numpy as np

from speechflow_tpu.data.core.datasample import AudioDataSample
from speechflow_tpu.data.processors import handler

__all__ = []


@handler(outputs={"audio_chunk", "sample_rate"})
def load_audio(ds: AudioDataSample, sample_rate: tp.Optional[int] = None) -> AudioDataSample:
    ds.audio_chunk.load(sr=sample_rate)
    ds.sample_rate = ds.audio_chunk.sr
    ds.transform_params.setdefault("load_audio", {})["sample_rate"] = ds.sample_rate
    return ds


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def trim_audio(ds: AudioDataSample, begin: float = 0.0,
               end: tp.Optional[float] = None) -> AudioDataSample:
    ds.audio_chunk.trim(begin, end)
    return ds


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def random_chunk(ds: AudioDataSample, chunk_duration: float = 1.0,
                 seed: tp.Optional[int] = None) -> AudioDataSample:
    """Random fixed-duration crop (vocoder training)."""
    dur = ds.audio_chunk.duration
    if dur > chunk_duration:
        rng = np.random.default_rng(seed)
        begin = float(rng.uniform(0.0, dur - chunk_duration))
        ds.audio_chunk.trim(begin, begin + chunk_duration)
    else:
        pad = chunk_duration - dur
        ds.audio_chunk.pad(0.0, pad)
    return ds


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def pad_audio(ds: AudioDataSample, left_s: float = 0.0, right_s: float = 0.0) -> AudioDataSample:
    ds.audio_chunk.pad(left_s, right_s)
    return ds


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def multiple_audio(ds: AudioDataSample, hop: int = 256) -> AudioDataSample:
    ds.audio_chunk.multiple(hop)
    return ds


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def resample_audio(ds: AudioDataSample, sample_rate: int = 24000) -> AudioDataSample:
    ds.audio_chunk.resample(sample_rate)
    ds.sample_rate = sample_rate
    return ds


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def preemphasis_audio(ds: AudioDataSample, coeff: float = 0.97) -> AudioDataSample:
    ds.audio_chunk.preemphasis(coeff)
    return ds


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def volume_normalize(ds: AudioDataSample, peak: float = 0.95) -> AudioDataSample:
    ds.audio_chunk.normalize(peak)
    return ds


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def loudness_normalize(ds: AudioDataSample, target_dbfs: float = -23.0) -> AudioDataSample:
    wav = ds.audio_chunk.waveform
    rms = float(np.sqrt(np.mean(wav**2) + 1e-12))
    target = 10.0 ** (target_dbfs / 20.0)
    ds.audio_chunk.data = (wav * (target / max(rms, 1e-9))).astype(np.float32)
    return ds


@handler(inputs={"audio_chunk"}, outputs={"mu_law_waveform"})
def mu_law_encode_audio(ds: AudioDataSample, mu: int = 255) -> AudioDataSample:
    ds.mu_law_waveform = ds.audio_chunk.mu_law_encode(mu)
    return ds


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def dither_audio(ds: AudioDataSample, amount: float = 1e-5,
                 seed: tp.Optional[int] = None) -> AudioDataSample:
    rng = np.random.default_rng(seed)
    wav = ds.audio_chunk.waveform
    ds.audio_chunk.data = (wav + amount * rng.standard_normal(len(wav))).astype(np.float32)
    return ds


_DENOISERS: tp.Dict[str, tp.Any] = {}


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def denoise(ds: AudioDataSample, model_ckpt: tp.Optional[str] = None,
            strength: float = 1.0) -> AudioDataSample:
    """Waveform denoising (reference: audio_processors.py:427
    DenoisingProcessor over facebook's pretrained dns64 demucs).

    With ``model_ckpt`` (a WaveDenoiser saved by utils.state_io.save_module),
    runs the framework's trainable demucs-class U-Net. Without it, falls back
    to spectral subtraction: the noise profile is estimated from the quietest
    10% of frames and subtracted (scaled by ``strength``) with the original
    phase kept."""
    wav = ds.audio_chunk.waveform
    if model_ckpt:
        if model_ckpt not in _DENOISERS:
            from speechflow_tpu.models.denoiser import WaveDenoiser, WaveDenoiserParams
            from speechflow_tpu.utils.state_io import load_module

            _DENOISERS[model_ckpt], _ = load_module(
                WaveDenoiser, WaveDenoiserParams, model_ckpt)
        import jax.numpy as jnp

        model = _DENOISERS[model_ckpt]
        den = np.asarray(model(jnp.asarray(wav[None])))[0]
        out = (1.0 - strength) * wav + strength * den[: len(wav)]
        ds.audio_chunk.data = out.astype(np.float32)
        return ds

    from scipy.signal import istft as sp_istft
    from scipy.signal import stft as sp_stft

    n_fft = 1024
    _, _, spec = sp_stft(wav, nperseg=n_fft, noverlap=3 * n_fft // 4)
    mag, phase = np.abs(spec), np.angle(spec)
    frame_energy = mag.sum(axis=0)
    k = max(int(0.1 * mag.shape[1]), 1)
    quiet = np.argsort(frame_energy)[:k]
    noise_profile = mag[:, quiet].mean(axis=1, keepdims=True)
    mag = np.maximum(mag - strength * noise_profile, 0.0)
    _, out = sp_istft(mag * np.exp(1j * phase), nperseg=n_fft,
                      noverlap=3 * n_fft // 4)
    out = np.pad(out, (0, max(0, len(wav) - len(out))))[: len(wav)]
    ds.audio_chunk.data = out.astype(np.float32)
    return ds
