"""GAN discriminators.

Capability parity with the reference vocoder discriminators
(tts/vocoders/vocos/modules/discriminators.py:14,170,325): MultiPeriodDiscriminator
(per-period 2D conv stacks over the waveform folded to (T/p, p)),
MultiResolutionDiscriminator (2D conv stacks over STFT magnitudes at three
resolutions), MultiBandDiscriminator (per-band splits of one resolution).
All return (logits list, feature-map list) for hinge/LSGAN + feature-matching
losses. Channels-last 2D convs (TPU layout); LeakyReLU activations.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import nnx

from speechflow_tpu import ops

__all__ = ["PeriodDiscriminator", "MultiPeriodDiscriminator",
           "ResolutionDiscriminator", "MultiResolutionDiscriminator",
           "VocoderDiscriminator"]


def _lrelu(x):
    return nnx.leaky_relu(x, negative_slope=0.1)


class PeriodDiscriminator(nnx.Module):
    def __init__(self, period: int, channels: int = 32, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.period = period
        chs = [1, channels, channels * 4, channels * 16, channels * 32, channels * 32]
        self.convs = nnx.List([
            nnx.Conv(chs[i], chs[i + 1], (5, 1), strides=(3, 1) if i < 4 else (1, 1),
                     padding="SAME", rngs=rngs)
            for i in range(5)
        ])
        self.post = nnx.Conv(chs[-1], 1, (3, 1), padding="SAME", rngs=rngs)

    def __call__(self, wav: jnp.ndarray) -> tp.Tuple[jnp.ndarray, tp.List[jnp.ndarray]]:
        b, t = wav.shape
        pad = (-t) % self.period
        x = jnp.pad(wav, ((0, 0), (0, pad)), mode="reflect")
        x = x.reshape(b, -1, self.period, 1)  # (B, T/p, p, 1)
        fmaps = []
        for conv in self.convs:
            x = _lrelu(conv(x))
            fmaps.append(x)
        logits = self.post(x)
        fmaps.append(logits)
        return logits.reshape(b, -1), fmaps


class MultiPeriodDiscriminator(nnx.Module):
    def __init__(self, periods: tp.Sequence[int] = (2, 3, 5, 7, 11),
                 channels: int = 32, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.discs = nnx.List([PeriodDiscriminator(p, channels, rngs=rngs) for p in periods])

    def __call__(self, wav: jnp.ndarray):
        outs = [d(wav) for d in self.discs]
        return [o[0] for o in outs], [o[1] for o in outs]


class ResolutionDiscriminator(nnx.Module):
    def __init__(self, n_fft: int, hop_length: int, channels: int = 32,
                 rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.convs = nnx.List([
            nnx.Conv(1, channels, (7, 5), strides=(2, 2), padding="SAME", rngs=rngs),
            nnx.Conv(channels, channels, (5, 3), strides=(2, 1), padding="SAME", rngs=rngs),
            nnx.Conv(channels, channels, (5, 3), strides=(2, 2), padding="SAME", rngs=rngs),
            nnx.Conv(channels, channels, (3, 3), strides=(2, 1), padding="SAME", rngs=rngs),
            nnx.Conv(channels, channels, (3, 3), strides=(2, 2), padding="SAME", rngs=rngs),
        ])
        self.post = nnx.Conv(channels, 1, (3, 3), padding="SAME", rngs=rngs)

    def __call__(self, wav: jnp.ndarray):
        mag = ops.magnitude(wav, self.n_fft, self.hop_length)  # (B, T, F)
        x = mag[..., None]
        fmaps = []
        for conv in self.convs:
            x = _lrelu(conv(x))
            fmaps.append(x)
        logits = self.post(x)
        fmaps.append(logits)
        return logits.reshape(wav.shape[0], -1), fmaps


class MultiResolutionDiscriminator(nnx.Module):
    def __init__(self, resolutions: tp.Sequence[tp.Tuple[int, int]] = ((1024, 256), (2048, 512), (512, 128)),
                 channels: int = 32, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.discs = nnx.List([ResolutionDiscriminator(n, h, channels, rngs=rngs) for n, h in resolutions])

    def __call__(self, wav: jnp.ndarray):
        outs = [d(wav) for d in self.discs]
        return [o[0] for o in outs], [o[1] for o in outs]


class VocoderDiscriminator(nnx.Module):
    """MPD + MRD ensemble — the default pairing of the reference engine.

    ``use_cqt: true`` swaps the MRD for the true multi-scale sub-band CQT
    discriminator, mirroring the reference's ``use_cqtd_disc`` switch
    (vocos/lightning_engine.py:54,116-121 — the shipped mel_bigvgan.yml
    trains with the CQT discriminator)."""

    def __init__(self, periods=(2, 3, 5, 7, 11),
                 resolutions=((1024, 256), (2048, 512), (512, 128)),
                 channels: int = 32, use_cqt: bool = False,
                 sample_rate: int = 24000,
                 cqt_bins_per_octave=(24, 36, 48),
                 cqt_n_octaves=(9, 9, 9),
                 rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.mpd = MultiPeriodDiscriminator(periods, channels, rngs=rngs)
        if use_cqt:
            from speechflow_tpu.models.vocoder.extra_discriminators import (
                MultiScaleSubbandCQTDiscriminator,
            )

            self.mrd = MultiScaleSubbandCQTDiscriminator(
                sr=sample_rate, n_octaves=tuple(cqt_n_octaves),
                bins_per_octave=tuple(cqt_bins_per_octave),
                filters=channels, rngs=rngs)
        else:
            self.mrd = MultiResolutionDiscriminator(resolutions, channels,
                                                    rngs=rngs)

    def __call__(self, wav: jnp.ndarray):
        l1, f1 = self.mpd(wav)
        l2, f2 = self.mrd(wav)
        return l1 + l2, f1 + f2
