"""NSF-HiFiGAN head: F0-driven source-filter synthesis with AdaIN styling.

Capability parity with the reference NSFHiFiGANHead
(tts/vocoders/vocos/modules/heads/nsf_hifigan.py:37, SineGen at :311,
StyleTTS2-style AdaIN conditioning): a harmonic sine source is generated from
the frame-level F0 (cumulative-phase oscillator, noise in unvoiced regions),
downsampled source branches merge into each upsampling stage, and residual
blocks are conditioned on a style embedding through adaptive instance
normalization. ``NSFiSTFTHead`` is the iSTFT variant (source features are
concatenated and the head predicts mag/phase instead of upsampling).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu import ops

__all__ = ["SineGen", "AdaIN", "NSFHiFiGANHead", "NSFiSTFTHead"]


class SineGen(nnx.Module):
    """Harmonic sine source from frame-level F0 (reference SineGen:311)."""

    def __init__(self, sample_rate: int = 24000, n_harmonics: int = 8,
                 amp: float = 0.1, noise_std: float = 0.003,
                 voiced_threshold: float = 10.0, rngs: nnx.Rngs = None):
        self.sample_rate = sample_rate
        self.n_harmonics = n_harmonics
        self.amp = amp
        self.noise_std = noise_std
        self.voiced_threshold = voiced_threshold
        self.rngs = rngs or nnx.Rngs(0)

    def __call__(self, f0_frames: jnp.ndarray, hop: int) -> jnp.ndarray:
        """(B, T_frames) -> (B, T_frames*hop, n_harmonics+1) source (+noise ch)."""
        b, t = f0_frames.shape
        # frame -> sample rate F0 (nearest-hold upsampling keeps voiced edges)
        f0 = jnp.repeat(f0_frames, hop, axis=1)  # (B, T*hop)
        voiced = (f0 > self.voiced_threshold).astype(jnp.float32)
        # cumulative phase; harmonics h * f0
        phase = 2 * jnp.pi * jnp.cumsum(f0 / self.sample_rate, axis=1)
        h = jnp.arange(1, self.n_harmonics + 1, dtype=jnp.float32)
        sines = jnp.sin(phase[..., None] * h)  # (B, S, H)
        key = self.rngs.params()
        noise = jax.random.normal(key, sines.shape) * self.noise_std
        # voiced: sine + small noise; unvoiced: noise only (scaled up, ref behavior)
        v = voiced[..., None]
        source = self.amp * sines * v + noise * (v + (1 - v) * (self.amp / 3 / self.noise_std))
        merged = jnp.concatenate([source, jax.random.normal(key, (b, t * hop, 1)) * self.noise_std], -1)
        return merged


class AdaIN(nnx.Module):
    """Adaptive instance norm over time with style-predicted affine."""

    def __init__(self, channels: int, style_dim: int, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.proj = nnx.Linear(style_dim, 2 * channels, rngs=rngs)

    def __call__(self, x: jnp.ndarray, style: tp.Optional[jnp.ndarray]) -> jnp.ndarray:
        mean = jnp.mean(x, axis=1, keepdims=True)
        std = jnp.std(x, axis=1, keepdims=True) + 1e-5
        x = (x - mean) / std
        if style is None:
            return x
        scale, shift = jnp.split(self.proj(style)[:, None, :], 2, axis=-1)
        return x * (1.0 + scale) + shift


class _StyledResBlock(nnx.Module):
    def __init__(self, channels: int, style_dim: int, kernel_size: int = 3,
                 dilations=(1, 3, 5), rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.convs = nnx.List([
            nnx.Conv(channels, channels, (kernel_size,), kernel_dilation=(d,),
                     padding="SAME", rngs=rngs) for d in dilations])
        self.norms = nnx.List([AdaIN(channels, style_dim, rngs=rngs) for _ in dilations])

    def __call__(self, x, style):
        for norm, conv in zip(self.norms, self.convs):
            x = x + conv(nnx.leaky_relu(norm(x, style), 0.1))
        return x


class NSFHiFiGANHead(nnx.Module):
    def __init__(self, dim: int = 512, upsample_rates: tp.Sequence[int] = (8, 8, 2, 2),
                 channels: int = 256, style_dim: int = 128, sample_rate: int = 24000,
                 n_harmonics: int = 8, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.sine_gen = SineGen(sample_rate, n_harmonics, rngs=rngs)
        self.upsample_rates = tuple(upsample_rates)
        self.total_up = int(np.prod(upsample_rates))
        self.pre = nnx.Conv(dim, channels, (7,), padding="SAME", rngs=rngs)
        self.ups = nnx.List([])
        self.source_convs = nnx.List([])
        self.resblocks = nnx.List([])
        ch = channels
        cum = self.total_up
        for r in upsample_rates:
            self.ups.append(nnx.ConvTranspose(ch, ch // 2, (2 * r,), strides=(r,),
                                              padding="SAME", rngs=rngs))
            ch //= 2
            cum //= r
            # source branch downsampled to this stage's rate
            self.source_convs.append(nnx.Conv(n_harmonics + 1, ch, (cum * 2 + 1,),
                                              strides=(cum,), padding="SAME", rngs=rngs))
            self.resblocks.append(_StyledResBlock(ch, style_dim, rngs=rngs))
        self.post = nnx.Conv(ch, 1, (7,), padding="SAME", rngs=rngs)

    def __call__(self, x: jnp.ndarray, f0_frames: jnp.ndarray,
                 style: tp.Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: (B, T, dim) hidden; f0_frames: (B, T) Hz -> (B, T*prod(rates))."""
        source = self.sine_gen(f0_frames, self.total_up)  # (B, S, H+1)
        h = self.pre(x)
        for up, sconv, res in zip(self.ups, self.source_convs, self.resblocks):
            h = up(nnx.leaky_relu(h, 0.1))
            s = sconv(source)
            t = min(h.shape[1], s.shape[1])
            h = h[:, :t] + s[:, :t]
            h = res(h, style)
        return jnp.tanh(self.post(h))[..., 0]


class NSFiSTFTHead(nnx.Module):
    """iSTFT variant: source features concatenated to the hidden stream, head
    predicts mag/phase (reference NSFiSTFTHiFiGANHead)."""

    def __init__(self, dim: int = 512, n_fft: int = 1024, hop_length: int = 256,
                 style_dim: int = 128, sample_rate: int = 24000,
                 n_harmonics: int = 8, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.sine_gen = SineGen(sample_rate, n_harmonics, rngs=rngs)
        self.hop = hop_length
        self.n_fft = n_fft
        self.source_pool = nnx.Conv(n_harmonics + 1, 64, (hop_length * 2 + 1,),
                                    strides=(hop_length,), padding="SAME", rngs=rngs)
        self.norm = AdaIN(dim, style_dim, rngs=rngs)
        self.out = nnx.Linear(dim + 64, n_fft + 2, rngs=rngs)

    def __call__(self, x, f0_frames, style=None):
        source = self.source_pool(self.sine_gen(f0_frames, self.hop))
        t = min(x.shape[1], source.shape[1])
        h = jnp.concatenate([self.norm(x[:, :t], style), source[:, :t]], axis=-1)
        mag, phase = jnp.split(self.out(h), 2, axis=-1)
        spec = jnp.exp(jnp.clip(mag, None, 10.0)) * jnp.exp(1j * phase)
        return ops.istft(spec, self.n_fft, self.hop)
