"""Additional discriminators: multi-band and log-frequency (CQT-class).

Capability parity with the reference MultiBandDiscriminator
(tts/vocoders/vocos/modules/discriminators.py:325) and
MultiScaleSubbandCQTDiscriminator (:459). The CQT analysis is realized as an
STFT magnitude mapped through a constant log-frequency (constant-Q spaced)
triangular filterbank at multiple scales — the conv stacks then operate on
log-frequency patches, matching the CQT discriminator's receptive structure
without a dedicated CQT transform (same spirit, TPU-friendly matmul).
"""

from __future__ import annotations

import functools
import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu import ops

__all__ = ["MultiBandDiscriminator", "LogFreqDiscriminator", "MultiScaleLogFreqDiscriminator"]


class _Conv2DStack(nnx.Module):
    def __init__(self, ch_in: int, channels: int, rngs: nnx.Rngs):
        self.convs = nnx.List([
            nnx.Conv(ch_in, channels, (3, 9), strides=(1, 1), padding="SAME", rngs=rngs),
            nnx.Conv(channels, channels, (3, 9), strides=(1, 2), padding="SAME", rngs=rngs),
            nnx.Conv(channels, channels, (3, 9), strides=(1, 2), padding="SAME", rngs=rngs),
            nnx.Conv(channels, channels, (3, 3), strides=(1, 1), padding="SAME", rngs=rngs),
        ])
        self.post = nnx.Conv(channels, 1, (3, 3), padding="SAME", rngs=rngs)

    def __call__(self, x):
        fmaps = []
        for conv in self.convs:
            x = nnx.leaky_relu(conv(x), 0.1)
            fmaps.append(x)
        logits = self.post(x)
        fmaps.append(logits)
        return logits.reshape(x.shape[0], -1), fmaps


class MultiBandDiscriminator(nnx.Module):
    """Band-split STFT discriminator (reference :325): one conv stack per
    frequency band of a single-resolution magnitude."""

    def __init__(self, n_fft: int = 1024, hop_length: int = 256,
                 bands: tp.Sequence[tp.Tuple[float, float]] = ((0.0, 0.1), (0.1, 0.25),
                                                               (0.25, 0.5), (0.5, 1.0)),
                 channels: int = 32, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.n_fft = n_fft
        self.hop_length = hop_length
        n_bins = n_fft // 2 + 1
        self.band_slices = [(int(b * n_bins), max(int(e * n_bins), int(b * n_bins) + 4))
                            for b, e in bands]
        self.stacks = nnx.List([_Conv2DStack(1, channels, rngs) for _ in bands])

    def __call__(self, wav: jnp.ndarray):
        mag = ops.magnitude(wav, self.n_fft, self.hop_length)  # (B, T, F)
        logits, fmaps = [], []
        for (b, e), stack in zip(self.band_slices, self.stacks):
            lg, fm = stack(mag[:, :, b:e, None])
            logits.append(lg)
            fmaps.append(fm)
        return logits, fmaps


@functools.lru_cache(maxsize=None)
def _logfreq_fb(n_fft: int, sr: int, n_bins: int, fmin: float) -> np.ndarray:
    """Constant-Q-spaced triangular filterbank over linear FFT bins."""
    lin = np.linspace(0, sr / 2, n_fft // 2 + 1)
    fmax = sr / 2
    centers = fmin * (fmax / fmin) ** (np.arange(n_bins + 2) / (n_bins + 1))
    fb = np.zeros((n_bins, len(lin)), np.float32)
    for i in range(n_bins):
        lo, c, hi = centers[i], centers[i + 1], centers[i + 2]
        up = (lin - lo) / max(c - lo, 1e-6)
        down = (hi - lin) / max(hi - c, 1e-6)
        fb[i] = np.clip(np.minimum(up, down), 0, 1)
    return fb


class LogFreqDiscriminator(nnx.Module):
    def __init__(self, n_fft: int = 1024, hop_length: int = 256, sr: int = 24000,
                 n_bins: int = 84, fmin: float = 32.7, channels: int = 32,
                 rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.fb = jnp.asarray(_logfreq_fb(n_fft, sr, n_bins, fmin))
        self.stack = _Conv2DStack(2, channels, rngs)

    def __call__(self, wav: jnp.ndarray):
        spec = ops.stft(wav, self.n_fft, self.hop_length)  # complex (B, T, F)
        real = jnp.matmul(spec.real, self.fb.T)
        imag = jnp.matmul(spec.imag, self.fb.T)
        x = jnp.stack([real, imag], axis=-1)  # (B, T, bins, 2)
        return self.stack(x)


class MultiScaleLogFreqDiscriminator(nnx.Module):
    """Three scales of the log-frequency discriminator (reference :459)."""

    def __init__(self, scales: tp.Sequence[tp.Tuple[int, int]] = ((512, 128), (1024, 256), (2048, 512)),
                 sr: int = 24000, channels: int = 32, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.discs = nnx.List([
            LogFreqDiscriminator(n, h, sr, channels=channels, rngs=rngs)
            for n, h in scales
        ])

    def __call__(self, wav: jnp.ndarray):
        outs = [d(wav) for d in self.discs]
        return [o[0] for o in outs], [o[1] for o in outs]
