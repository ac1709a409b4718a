"""Mel filterbank and dB/normalization ops matching the reference numerics.

Replaces the reference MelProcessor
(speechflow/data_pipeline/datasample_processors/spectrogram_processors.py:350-648):

* filterbank: librosa-compatible — Slaney mel scale (linear < 1 kHz, log above)
  or HTK scale, triangular weights on FFT-bin frequencies, Slaney area
  normalization (2 / bandwidth),
* ``amp_to_db``: natural log of the clipped magnitude (a_min=1e-5) times an
  optional multiplier — so ``min_level_db = multiplier * ln(a_min)``,
* ``normalize``: symmetric [-max_abs, +max_abs] range over [min_level_db, 0]
  with clipping only at the bottom (defaults max_abs_value=4.0),
* exact inverses ``db_to_amp`` / ``denormalize`` and pinv ``mel_to_linear``.

The filterbank is built on host (numpy, cached) and closed over by jit code as
a constant; the matmul runs on the MXU.
"""

from __future__ import annotations

import functools
import typing as tp

import jax.numpy as jnp
import numpy as np

__all__ = [
    "mel_filterbank", "linear_to_mel", "mel_to_linear",
    "amp_to_db", "db_to_amp", "normalize_mel", "denormalize_mel",
    "MIN_LEVEL_DB",
]

#: default min level in natural-log space: ln(1e-5)
MIN_LEVEL_DB = float(np.log(1e-5))


def _hz_to_mel(freq: np.ndarray, htk: bool = False) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # Slaney: linear below 1 kHz, logarithmic above
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = freq >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz(mel: np.ndarray, htk: bool = False) -> np.ndarray:
    mel = np.asarray(mel, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freq = f_min + f_sp * mel
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = mel >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (mel - min_log_mel)), freq)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: tp.Optional[float] = None,
    htk: bool = False,
    norm: tp.Optional[str] = "slaney",
) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filterbank, librosa-compatible."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)

    mel_pts = np.linspace(_hz_to_mel(np.array(fmin), htk), _hz_to_mel(np.array(fmax), htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]

    return weights.astype(np.float32)


def linear_to_mel(
    mag: jnp.ndarray,
    sr: int,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: tp.Optional[float] = None,
    htk: bool = False,
) -> jnp.ndarray:
    """(..., T, n_bins) magnitude -> (..., T, n_mels)."""
    n_fft = (mag.shape[-1] - 1) * 2
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk))
    return jnp.matmul(mag, fb.T)


def mel_to_linear(
    mel: jnp.ndarray,
    sr: int,
    n_fft: int,
    fmin: float = 0.0,
    fmax: tp.Optional[float] = None,
    htk: bool = False,
    rcond: float = 1e-5,
) -> jnp.ndarray:
    """Pseudo-inverse mel->linear (reference: mel_to_linear, :480)."""
    n_mels = mel.shape[-1]
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk)
    inv = np.linalg.pinv(fb, rcond=rcond).astype(np.float32)  # (n_bins, n_mels)
    mag = jnp.matmul(mel, jnp.asarray(inv).T)
    return jnp.maximum(mag, fmin)


def amp_to_db(
    x: jnp.ndarray,
    multiplier: float = 1.0,
    a_min: float = 1e-5,
    a_max: tp.Optional[float] = None,
) -> jnp.ndarray:
    out = jnp.log(jnp.clip(x, a_min, a_max))
    if multiplier != 1.0:
        out = out * multiplier
    return out


def db_to_amp(x: jnp.ndarray, multiplier: float = 1.0) -> jnp.ndarray:
    if multiplier != 1.0:
        x = x / multiplier
    return jnp.exp(x)


def normalize_mel(
    mel_db: jnp.ndarray,
    max_abs_value: float = 4.0,
    min_level_db: float = MIN_LEVEL_DB,
) -> jnp.ndarray:
    out = (2 * max_abs_value) * ((mel_db - min_level_db) / (-min_level_db)) - max_abs_value
    return jnp.clip(out, -max_abs_value, None)


def denormalize_mel(
    mel_norm: jnp.ndarray,
    max_abs_value: float = 4.0,
    min_level_db: float = MIN_LEVEL_DB,
) -> jnp.ndarray:
    clipped = jnp.clip(mel_norm, -max_abs_value, None)
    return (clipped + max_abs_value) * (-min_level_db) / (2 * max_abs_value) + min_level_db
