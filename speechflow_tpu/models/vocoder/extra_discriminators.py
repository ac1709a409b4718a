"""Additional discriminators: multi-band, true CQT, and log-frequency.

Capability parity with the reference MultiBandDiscriminator
(tts/vocoders/vocos/modules/discriminators.py:325) and
MultiScaleSubbandCQTDiscriminator (:459). The CQT discriminator here runs on
the framework's TRUE constant-Q transform (ops/cqt.py — octave-recursive,
per-bin constant Q, complex output), matching the reference's nnAudio
CQT2010v2 analysis. The cheaper log-frequency STFT-filterbank variant is kept
as an alternative (same receptive structure, one matmul instead of nine).
"""

from __future__ import annotations

import functools
import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu import ops

__all__ = ["MultiBandDiscriminator", "LogFreqDiscriminator",
           "MultiScaleLogFreqDiscriminator", "DiscriminatorCQT",
           "MultiScaleSubbandCQTDiscriminator"]


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


class DiscriminatorCQT(nnx.Module):
    """One CQT-scale discriminator (reference DiscriminatorCQT,
    tts/vocoders/vocos/modules/discriminators.py:517): complex CQT ->
    (real, imag) channels -> per-octave pre-convs -> frequency-concat ->
    time-dilated conv stack with frequency stride 2 -> post conv. The CQT is
    the framework's true octave-recursive transform (ops/cqt.py), not a
    log-spaced STFT filterbank."""

    def __init__(self, sr: int, hop_length: int = 512, n_octaves: int = 9,
                 bins_per_octave: int = 24, filters: int = 32,
                 max_filters: int = 1024, dilations: tp.Sequence[int] = (1, 2, 4),
                 rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.sr = sr
        self.hop_length = hop_length
        self.n_octaves = n_octaves
        self.bins_per_octave = bins_per_octave
        self.conv_pres = nnx.List([
            nnx.Conv(2, 2, (3, 9), padding="SAME", rngs=rngs)
            for _ in range(n_octaves)
        ])
        convs = [nnx.Conv(2, filters, (3, 9), padding="SAME", rngs=rngs)]
        in_ch = filters
        for i, d in enumerate(dilations):
            out_ch = min(filters * (2 ** (i + 1)), max_filters)
            convs.append(nnx.Conv(in_ch, out_ch, (3, 9), strides=(1, 2),
                                  kernel_dilation=(d, 1), padding="SAME",
                                  rngs=rngs))
            in_ch = out_ch
        convs.append(nnx.Conv(in_ch, in_ch, (3, 3), padding="SAME", rngs=rngs))
        self.convs = nnx.List(convs)
        self.post = nnx.Conv(in_ch, 1, (3, 3), padding="SAME", rngs=rngs)

    def __call__(self, wav: jnp.ndarray):
        from speechflow_tpu.ops.cqt import cqt

        z = cqt(wav, self.sr, self.hop_length,
                n_octaves=self.n_octaves,
                bins_per_octave=self.bins_per_octave)      # (B, T, F, 2)
        z = z.astype(jnp.float32)
        # per-octave pre-convs over (T, bins_per_octave) patches
        parts = []
        for o in range(self.n_octaves):
            sl = z[:, :, o * self.bins_per_octave:(o + 1) * self.bins_per_octave, :]
            parts.append(self.conv_pres[o](sl))
        x = jnp.concatenate(parts, axis=2)                 # (B, T, F, 2)
        fmaps = []
        for conv in self.convs:
            x = nnx.leaky_relu(conv(x), 0.1)
            fmaps.append(x)
        logits = self.post(x)
        fmaps.append(logits)
        return logits.reshape(x.shape[0], -1), fmaps


class MultiScaleSubbandCQTDiscriminator(nnx.Module):
    """Three CQT scales (reference MultiScaleSubbandCQTDiscriminator :459:
    hops 512/256/256 at the 2x working rate, 9 octaves, 24/36/48 bins per
    octave)."""

    def __init__(self, sr: int = 24000,
                 hop_lengths: tp.Sequence[int] = (512, 256, 256),
                 n_octaves: tp.Sequence[int] = (9, 9, 9),
                 bins_per_octave: tp.Sequence[int] = (24, 36, 48),
                 filters: int = 32, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.discs = nnx.List([
            DiscriminatorCQT(sr, h, o, b, filters=filters, rngs=rngs)
            for h, o, b in zip(hop_lengths, n_octaves, bins_per_octave)
        ])

    def __call__(self, wav: jnp.ndarray):
        outs = [d(wav) for d in self.discs]
        return [o[0] for o in outs], [o[1] for o in outs]


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
