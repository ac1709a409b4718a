"""Spectral/mel/pitch handlers (host-side numpy mirrors of the device ops).

Reference: SpectralProcessor/MelProcessor/PitchProcessor
(speechflow/data_pipeline/datasample_processors/spectrogram_processors.py:90,350,690).
Numerics match speechflow_tpu.ops exactly (shared filterbank/window builders).
"""

from __future__ import annotations

import typing as tp

import numpy as np
from scipy import ndimage

from speechflow_tpu.data.core.datasample import SpectrogramDataSample
from speechflow_tpu.data.processors import handler
from speechflow_tpu.data.processors import np_dsp

__all__ = []


@handler(inputs={"audio_chunk"}, outputs={"magnitude", "hop_len"})
def magnitude(ds: SpectrogramDataSample, n_fft: int = 1024, hop_len: int = 256,
              win_len: tp.Optional[int] = None, center: bool = True) -> SpectrogramDataSample:
    ds.magnitude = np_dsp.magnitude_np(ds.audio_chunk.waveform, n_fft, hop_len, win_len, center)
    ds.hop_len = hop_len
    ds.transform_params.setdefault("magnitude", {}).update(
        n_fft=n_fft, hop_len=hop_len, win_len=win_len or n_fft, center=center
    )
    return ds


@handler(inputs={"magnitude"}, outputs={"energy"})
def energy(ds: SpectrogramDataSample) -> SpectrogramDataSample:
    ds.energy = np_dsp.energy_np(ds.magnitude)
    return ds


@handler(inputs={"magnitude"}, outputs={"spectral_flatness"})
def spectral_flatness(ds: SpectrogramDataSample) -> SpectrogramDataSample:
    ds.spectral_flatness = np_dsp.spectral_flatness_np(ds.magnitude)
    return ds


@handler(inputs={"magnitude"}, outputs={"mel"})
def linear_to_mel(ds: SpectrogramDataSample, n_mels: int = 80, f_min: float = 0.0,
                  f_max: tp.Optional[float] = None, librosa_htk: bool = False) -> SpectrogramDataSample:
    sr = ds.audio_chunk.sr if ds.audio_chunk is not None else ds.sample_rate
    ds.mel = np_dsp.linear_to_mel_np(ds.magnitude, sr, n_mels, f_min, f_max, librosa_htk)
    ds.transform_params.setdefault("linear_to_mel", {}).update(
        n_mels=n_mels, f_min=f_min, f_max=f_max, sample_rate=sr
    )
    return ds


@handler(inputs={"mel"}, outputs={"mel"})
def amp_to_db(ds: SpectrogramDataSample, multiplier: float = 1.0, a_min: float = 1e-5,
              a_max: tp.Optional[float] = None) -> SpectrogramDataSample:
    ds.mel = np_dsp.amp_to_db_np(ds.mel, multiplier, a_min, a_max)
    min_level_db = multiplier * float(np.log(a_min))
    ds.transform_params.setdefault("amp_to_db", {})["min_level_db"] = min_level_db
    return ds


@handler(inputs={"mel"}, outputs={"mel"})
def normalize_mel(ds: SpectrogramDataSample, max_abs_value: float = 4.0,
                  min_level_db: tp.Optional[float] = None) -> SpectrogramDataSample:
    if min_level_db is None:
        min_level_db = ds.get_param_val("min_level_db", np_dsp.MIN_LEVEL_DB)
    ds.mel = np_dsp.normalize_mel_np(ds.mel, max_abs_value, min_level_db)
    ds.transform_params.setdefault("normalize_mel", {}).update(
        max_abs_value=max_abs_value, min_level_db=min_level_db, mel_min_val=-max_abs_value
    )
    return ds


_CREPE_CACHE: tp.Dict[str, tp.Any] = {}


@handler(inputs={"audio_chunk"}, outputs={"pitch"})
def pitch(ds: SpectrogramDataSample, f0_min: float = 80.0, f0_max: float = 880.0,
          frame_length: int = 2048, threshold: float = 0.2,
          method: str = "yin",
          crepe_ckpt: tp.Optional[str] = None,
          yingram_bins: int = 20) -> SpectrogramDataSample:
    """``method``: 'yin' (default, host numpy), 'crepe' — the trainable
    CREPE-class conv tracker (models/pitch/crepe.py), or 'yingram' — the
    NANSY midi-scale CMNDF image (2-D pitch representation, clipped to
    [0, 4] like the reference; pitch-method selection at
    spectrogram_processors.py:693-699, yingram branch :793-813).  'crepe'
    needs a ``crepe_ckpt`` trained by models.pitch.train_crepe; the model is
    loaded once per worker process and runs batched on the worker's jax
    backend."""
    hop_len = ds.get_param_val("hop_len", ds.hop_len or 256)
    if method == "crepe":
        if not crepe_ckpt:
            raise ValueError("pitch method 'crepe' requires crepe_ckpt")
        model = _CREPE_CACHE.get(crepe_ckpt)
        if model is None:
            from speechflow_tpu.models.pitch import load_crepe

            model = _CREPE_CACHE[crepe_ckpt] = load_crepe(crepe_ckpt)
        from speechflow_tpu.models.pitch import crepe_f0

        f0 = np.asarray(crepe_f0(model, ds.audio_chunk.waveform,
                                 sr=ds.audio_chunk.sr, hop_length=hop_len),
                        np.float32)[0]
        fmax = float(f0_max)
        f0 = np.where((f0 < f0_min) | (f0 > fmax), 0.0, f0).astype(np.float32)
    elif method == "yin":
        f0 = np_dsp.yin_f0_np(
            ds.audio_chunk.waveform, ds.audio_chunk.sr, hop_len, frame_length, f0_min, f0_max, threshold
        )
    elif method == "yingram":
        # CMNDF lags must fit inside the analysis window
        lag_max = min(2047, frame_length - 1)
        f0 = np.clip(np_dsp.yingram_np(
            ds.audio_chunk.waveform, ds.audio_chunk.sr, hop_len, frame_length,
            lag_max=lag_max, bins_per_semitone=yingram_bins), 0.0, 4.0)
    else:
        raise ValueError(f"unknown pitch method: {method!r}")
    # reconcile to mel frame count (reference: zoom to magnitude frames, :824)
    if ds.magnitude is not None and f0.shape[0] != ds.magnitude.shape[0]:
        fmax = f0.max() if len(f0) else 0.0
        zoom = [ds.magnitude.shape[0] / f0.shape[0]] + [1.0] * (f0.ndim - 1)
        f0 = ndimage.zoom(f0, zoom, order=1)
        f0 = np.clip(f0, 0.0, fmax)[: ds.magnitude.shape[0]].astype(np.float32)
    ds.pitch = f0
    return ds


# alias matching reference naming
MIN_LEVEL_DB = np_dsp.MIN_LEVEL_DB


@handler(inputs={"magnitude"}, outputs={"spectral_tilt"})
def spectral_tilt(ds: SpectrogramDataSample) -> SpectrogramDataSample:
    """Per-frame spectral slope via least squares over dB-rescaled bins
    (reference: spectrogram_processors.py:273, Owren's method corrected)."""
    mag = np.maximum(ds.magnitude.astype(np.float64), 1e-8)
    n_bins = mag.shape[-1]
    db = 20.0 * np.log10(mag / 0.0002)
    mn, mx = db.min(axis=-1, keepdims=True), db.max(axis=-1, keepdims=True)
    scaled = (db - mn) * ((n_bins - 1) / np.maximum(mx - mn, 1e-6))
    x = np.arange(n_bins)
    xc = x - x.mean()
    slope = (scaled @ xc) / (xc @ xc)
    ds.additional["spectral_tilt"] = (slope.max() - slope).astype(np.float32)
    return ds


@handler(inputs={"magnitude"}, outputs={"spectral_envelope"})
def spectral_envelope(ds: SpectrogramDataSample, cutoff: int = 3,
                      n_bins: int = 80) -> SpectrogramDataSample:
    """Cepstral-liftered spectral envelope, [0,1]-normalized and resampled
    (reference: spectrogram_processors.py:314)."""
    from scipy import signal as _sig

    d = ds.magnitude.astype(np.float64)
    ceps = np.fft.irfft(np.log(d + 1e-6), axis=-1).real
    lifter = np.zeros(ceps.shape[-1])
    lifter[:cutoff] = 1.0
    if cutoff < len(lifter):
        lifter[cutoff] = 0.5
    env = np.abs(np.exp(np.fft.rfft(ceps * lifter, axis=-1)))
    min_level = np.exp(-100 / 20 * np.log(10))
    env = 20 * np.log10(np.maximum(min_level, env)) - 16
    env = (env + 100) / 100
    env = env - env.min()
    env = env / max(env.max(), 1e-9)
    env = np.clip(_sig.resample(env, n_bins, axis=-1), 0.0, 1.0)  # Fourier resample overshoots
    ds.additional["spectral_envelope"] = env.astype(np.float32)
    return ds
