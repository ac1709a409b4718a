"""Waveform/1D-signal ops (batched jnp).

Replaces the reference SignalProcessor / 1D-signal helpers
(speechflow/data_pipeline/datasample_processors/audio_processors.py:57,
spectrogram_processors.py:242-273,1004-1339): preemphasis, energy, spectral
flatness, mu-law codec, dithering, RMS loudness normalization, and the
signal_enhancement/clip/normalize family used to clean pitch/energy contours.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

__all__ = [
    "preemphasis", "deemphasis", "energy", "spectral_flatness",
    "mu_law_encode", "mu_law_decode", "rms_normalize", "dither",
    "smooth_1d", "clip_quantile", "range_normalize", "depthwise_conv1d",
]


def depthwise_conv1d(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: tp.Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-channel ("depthwise") 1D convolution as K shifted multiply-adds.

    ``x``: (B, T, C); ``kernel``: flax Conv layout (K, 1, C) or (K, C);
    SAME padding, cross-correlation orientation — numerically identical to
    ``nnx.Conv(C, C, (K,), feature_group_count=C, padding="SAME")``.

    Why not the grouped conv: ``feature_group_count=C`` lowers to C tiny
    independent convs on TPU and measured catastrophically slow (the
    anti-alias FIR at B32xT65536xC64 took 1.3 s vs ~15 ms in this shifted-add
    form — see ops/anti_alias.py). A K-tap depthwise conv is K elementwise
    FMAs on the VPU; XLA fuses the shifts into one pass over HBM.
    """
    if kernel.ndim == 3:
        kernel = kernel[:, 0, :]
    k = kernel.shape[0]
    t = x.shape[1]
    pad_lo = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad_lo, k - 1 - pad_lo), (0, 0)))
    out = xp[:, 0:t, :] * kernel[0]
    for j in range(1, k):
        out = out + xp[:, j:j + t, :] * kernel[j]
    if bias is not None:
        out = out + bias
    return out


def preemphasis(x: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """y[t] = x[t] - coeff * x[t-1] along the last axis (FIR, fully parallel)."""
    return jnp.concatenate([x[..., :1], x[..., 1:] - coeff * x[..., :-1]], axis=-1)


def deemphasis(x: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """Inverse of preemphasis: y[t] = x[t] + coeff*y[t-1] (linear scan)."""
    # associative_scan over the linear recurrence y_t = a*y_{t-1} + x_t
    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, b1 * a2 + b2

    a = jnp.full_like(x, coeff)
    _, y = jax.lax.associative_scan(combine, (a, x), axis=-1)
    return y


def energy(mag: jnp.ndarray) -> jnp.ndarray:
    """Per-frame L2 norm over frequency bins (reference: energy, :242)."""
    return jnp.linalg.norm(mag, axis=-1)


def spectral_flatness(mag: jnp.ndarray, power: float = 2.0, amin: float = 1e-10) -> jnp.ndarray:
    """librosa-compatible flatness of (..., T, n_bins) magnitude, then the
    reference's ``1 - clip(flatness*100, 0, 0.99)`` voicedness transform (:260)."""
    s = jnp.maximum(mag, amin) ** power
    gmean = jnp.exp(jnp.mean(jnp.log(s), axis=-1))
    amean = jnp.mean(s, axis=-1)
    flat = gmean / amean
    return 1.0 - jnp.clip(flat * 100.0, 0.0, 0.99)


def mu_law_encode(x: jnp.ndarray, mu: int = 255) -> jnp.ndarray:
    x = jnp.clip(x, -1.0, 1.0)
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(float(mu))


def mu_law_decode(y: jnp.ndarray, mu: int = 255) -> jnp.ndarray:
    return jnp.sign(y) * ((1.0 + mu) ** jnp.abs(y) - 1.0) / mu


def rms_normalize(x: jnp.ndarray, target_dbfs: float = -23.0, eps: float = 1e-9) -> jnp.ndarray:
    """Loudness normalization to a target RMS level in dBFS (ffmpeg-loudnorm-lite,
    reference: audio_processors.py ffmpeg_loudnorm capability)."""
    rms = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    target = 10.0 ** (target_dbfs / 20.0)
    return x * (target / jnp.maximum(rms, eps))


def dither(x: jnp.ndarray, key: jax.Array, amount: float = 1e-5) -> jnp.ndarray:
    return x + amount * jax.random.normal(key, x.shape, x.dtype)


def smooth_1d(x: jnp.ndarray, win: int = 5) -> jnp.ndarray:
    """Moving-average smoothing along the last axis (signal_enhancement core)."""
    kernel = jnp.ones((win,), x.dtype) / win
    pad = win // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    # depthwise conv via correlate on last axis
    def conv1(v):
        return jnp.convolve(v, kernel, mode="valid")

    flat = xp.reshape(-1, xp.shape[-1])
    out = jax.vmap(conv1)(flat)
    return out.reshape(x.shape[:-1] + (out.shape[-1],))[..., : x.shape[-1]]


def clip_quantile(x: jnp.ndarray, q_low: float = 0.01, q_high: float = 0.99) -> jnp.ndarray:
    lo = jnp.quantile(x, q_low, axis=-1, keepdims=True)
    hi = jnp.quantile(x, q_high, axis=-1, keepdims=True)
    return jnp.clip(x, lo, hi)


def range_normalize(
    x: jnp.ndarray,
    minimum: tp.Union[float, jnp.ndarray],
    maximum: tp.Union[float, jnp.ndarray],
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Map to [0, 1] given (per-speaker) feature ranges (StatisticsRange analogue)."""
    return (x - minimum) / jnp.maximum(maximum - minimum, eps)
