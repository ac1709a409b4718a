"""Vocoder heads: hidden states -> waveform.

Capability parity with the reference head zoo
(tts/vocoders/vocos/modules/heads/): ``ISTFTHead`` (istft.py:19) predicts
per-frame magnitude+phase and inverts with the shared overlap-add ISTFT
kernel; ``SnakeUpsampleHead`` is the BigVGAN-class upsampling stack
(bigvgan.py:45) rebuilt TPU-first: transposed-conv upsampling with
anti-aliased snake-beta activations (the reference's fused CUDA kernel
becomes XLA-fused upsample-FIR -> snake -> FIR, see ops in this module);
``IMDCTSymExpHead``/``IMDCTCosHead`` (imdct.py:33,92) decode via inverse MDCT
expressed as ISTFT-style overlap-add of a DCT-IV, with symmetric-exp /
clipped-exp magnitude mappings.
"""

from __future__ import annotations

import math
import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu import ops

__all__ = ["ISTFTHead", "SnakeUpsampleHead", "IMDCTSymExpHead", "IMDCTCosHead",
           "DACHead"]


class ISTFTHead(nnx.Module):
    def __init__(self, dim: int = 512, n_fft: int = 1024, hop_length: int = 256,
                 rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.out = nnx.Linear(dim, n_fft + 2, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, dim) -> (B, T * hop) waveform."""
        h = self.out(x)
        mag, phase = jnp.split(h, 2, axis=-1)
        mag = jnp.exp(jnp.clip(mag, None, 10.0))  # bound for stability (ref: istft.py)
        spec = mag * jnp.exp(1j * phase)
        # centered ISTFT of T frames covers (T-1)*hop samples
        return ops.istft(spec, self.n_fft, self.hop_length)


class AntiAliasedSnake(nnx.Module):
    """upsample2x (FIR interp) -> snake-beta -> FIR -> downsample2x.

    The TPU replacement for the reference's fused CUDA anti_alias_activation
    (SURVEY §2.4 item 1). Delegates to ops.anti_alias.anti_alias_snake (XLA
    composition by default; a validated Pallas tile kernel exists alongside).
    """

    def __init__(self, channels: int, taps: int = 12, remat: bool = True,
                 rngs: nnx.Rngs = None):
        self.alpha = nnx.Param(jnp.zeros((channels,)))
        self.beta = nnx.Param(jnp.zeros((channels,)))
        self.taps = taps
        self.remat = remat

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from speechflow_tpu.ops.anti_alias import anti_alias_snake

        return anti_alias_snake(x, self.alpha[...], self.beta[...], self.taps,
                                remat=self.remat)

    def from_shared(self, y_even: jnp.ndarray, y_odd: jnp.ndarray) -> jnp.ndarray:
        """Apply snake + decimation FIR to a precomputed (shared) stage-1
        pair — see ops.anti_alias.aa_upsample_fir: the interpolation FIR is
        parameter-free, so MRF branches consuming the same input share it."""
        from speechflow_tpu.ops.anti_alias import aa_snake_downsample

        return aa_snake_downsample(y_even, y_odd, self.alpha[...],
                                   self.beta[...], self.taps)


class ResBlock(nnx.Module):
    """AMP residual block: dilated convs with anti-aliased snake activations."""

    def __init__(self, channels: int, kernel_size: int = 3,
                 dilations: tp.Sequence[int] = (1, 3, 5), taps: int = 12,
                 remat: bool = True, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.convs = nnx.List([])
        self.acts = nnx.List([])
        for d in dilations:
            self.convs.append(nnx.Conv(channels, channels, (kernel_size,),
                                       kernel_dilation=(d,), padding="SAME", rngs=rngs))
            self.acts.append(AntiAliasedSnake(channels, taps=taps, remat=remat,
                                              rngs=rngs))

    def __call__(self, x: jnp.ndarray, shared_stage1=None) -> jnp.ndarray:
        """``shared_stage1``: precomputed interpolation-FIR phases of ``x``
        (shared across the MRF branches of a stage — bit-exact reuse)."""
        for i, (act, conv) in enumerate(zip(self.acts, self.convs)):
            a = act.from_shared(*shared_stage1) if (i == 0 and
                                                    shared_stage1 is not None) \
                else act(x)
            x = x + conv(a)
        return x


class SnakeUpsampleHead(nnx.Module):
    """BigVGAN-class head: stacked transposed-conv upsampling + AMP blocks.

    Multi-receptive-field fusion (``resblock_kernel_sizes``) follows the
    reference BigVGANHead (heads/bigvgan.py:23-26: kernels (3, 7, 11),
    upsample_initial_channel 1536, rates (4, 4, 2, 2, 2, 2)): each stage
    averages parallel AMP resblocks with different kernel sizes.
    """

    def __init__(self, dim: int = 512, upsample_rates: tp.Sequence[int] = (8, 8, 2, 2),
                 upsample_kernel_sizes: tp.Optional[tp.Sequence[int]] = None,
                 channels: int = 256,
                 resblock_kernel_sizes: tp.Sequence[int] = (3,),
                 taps: int = 12, remat: bool = True,
                 rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        upsample_kernel_sizes = upsample_kernel_sizes or [2 * r for r in upsample_rates]
        self.pre = nnx.Conv(dim, channels, (7,), padding="SAME", rngs=rngs)
        self.ups = nnx.List([])
        self.resblocks = nnx.List([])
        self.taps = taps
        ch = channels
        for r, k in zip(upsample_rates, upsample_kernel_sizes):
            self.ups.append(nnx.ConvTranspose(ch, ch // 2, (k,), strides=(r,),
                                              padding="SAME", rngs=rngs))
            ch = ch // 2
            self.resblocks.append(nnx.List([
                ResBlock(ch, ks, taps=taps, remat=remat, rngs=rngs)
                for ks in resblock_kernel_sizes]))
        self.post_act = AntiAliasedSnake(ch, taps=taps, remat=remat, rngs=rngs)
        self.post = nnx.Conv(ch, 1, (7,), padding="SAME", rngs=rngs)
        self.total_upsample = int(np.prod(upsample_rates))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from speechflow_tpu.ops.anti_alias import aa_upsample_fir

        x = self.pre(x)
        for up, res_group in zip(self.ups, self.resblocks):
            x = up(x)
            # the interpolation FIR of each branch's first activation sees
            # the same x: compute it once for the whole MRF group (exact;
            # saves 2 of the 18 FIR passes per 3-branch stage)
            s1 = aa_upsample_fir(x, self.taps) if len(res_group) > 1 else None
            acc = res_group[0](x, shared_stage1=s1)
            for res in res_group[1:]:
                acc = acc + res(x, shared_stage1=s1)
            x = acc / len(res_group)
        x = self.post_act(x)
        x = self.post(x)
        return jnp.tanh(x)[..., 0]


def _factor_strides(hop: int, max_stride: int = 8) -> tp.Tuple[int, ...]:
    """Factor ``hop`` into transposed-conv strides of at most ``max_stride``
    (largest first), so the codec decoder's total upsampling equals the
    vocoder hop exactly."""
    strides = []
    rem = hop
    while rem > 1:
        for s in range(min(max_stride, rem), 1, -1):
            if rem % s == 0:
                strides.append(s)
                rem //= s
                break
        else:
            raise ValueError(f"cannot factor hop {hop} into strides <= {max_stride}")
    return tuple(strides)


class DACHead(nnx.Module):
    """Codec-decoder head (reference: heads/dac.py DACHead): project backbone
    hidden states into the codec latent space and decode with the NeuralCodec
    transposed-conv decoder.

    The reference wraps a *pretrained* DescriptAC decoder (dac.py:20-31,
    ``proj -> 10*z_hat -> dac.decoder``); with no downloadable codecs in this
    zero-egress build, the framework's trainable DAC-class codec decoder
    (models/codec/rvq.py) takes its place — trained jointly under the GAN
    losses, or warm-started from a codec experiment via the usual ``-w``
    prefix-filtered weight load. The codec strides are derived from the
    vocoder hop so T feature frames decode to exactly T*hop samples.
    """

    def __init__(self, dim: int, hop_length: int = 256,
                 codec_params: tp.Optional[dict] = None, rngs: nnx.Rngs = None):
        from speechflow_tpu.models.codec import CodecDecoder, CodecParams

        rngs = rngs or nnx.Rngs(0)
        cp = dict(codec_params or {})
        cp.setdefault("strides", _factor_strides(hop_length))
        params = CodecParams.create(cp)
        # decoder only: the encoder/RVQ halves would be dead parameters here
        # (never forward, yet optimized, decayed, and checkpointed)
        self.decoder = CodecDecoder(params, rngs=rngs)
        if self.decoder.hop != hop_length:
            raise ValueError(
                f"codec strides {cp['strides']} upsample x{self.decoder.hop}, "
                f"but the vocoder hop is {hop_length}")
        self.proj = nnx.Linear(dim, params.latent_dim, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, dim) -> (B, T * hop) waveform."""
        # no 10x latent rescale: the reference's factor matches its frozen
        # pretrained decoder's input scale; a jointly-trained decoder learns it
        return self.decoder(self.proj(x))


def _mdct_basis(frame_len: int) -> np.ndarray:
    """DCT-IV-style basis for MDCT of window length 2N (N = frame_len)."""
    n = frame_len
    k = np.arange(n)[None, :]
    t = np.arange(2 * n)[:, None]
    return np.cos(np.pi / n * (t + 0.5 + n / 2) * (k + 0.5)).astype(np.float32)


class _IMDCTHead(nnx.Module):
    def __init__(self, dim: int, mdct_frame_len: int = 512, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.frame_len = mdct_frame_len
        self.out = nnx.Linear(dim, mdct_frame_len, rngs=rngs)
        basis = _mdct_basis(mdct_frame_len) * (2.0 / mdct_frame_len)
        window = np.sin(np.pi / (2 * mdct_frame_len * 2) * (np.arange(2 * mdct_frame_len) * 2 + 1))
        self.basis = jnp.asarray(basis * window[:, None])

    def _coeffs(self, h: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        coeffs = self._coeffs(self.out(x))           # (B, T, N)
        frames = jnp.einsum("btn,fn->btf", coeffs, self.basis)  # (B, T, 2N)
        t = frames.shape[1]
        hop = self.frame_len
        wav = ops.overlap_add(frames, hop)  # dense strip OLA (2N/hop == 2)
        return wav[:, hop // 2 : hop // 2 + t * hop]


class IMDCTSymExpHead(_IMDCTHead):
    """Symmetric-exponential magnitude mapping (reference: imdct.py:33)."""

    def _coeffs(self, h: jnp.ndarray) -> jnp.ndarray:
        return jnp.sign(h) * (jnp.exp(jnp.clip(jnp.abs(h), None, 10.0)) - 1.0)


class IMDCTCosHead(_IMDCTHead):
    """exp(m)·cos(p) parameterization (reference: imdct.py:92)."""

    def __init__(self, dim: int, mdct_frame_len: int = 512, rngs: nnx.Rngs = None):
        super().__init__(dim, mdct_frame_len, rngs=rngs)
        self.out = nnx.Linear(dim, mdct_frame_len * 2, rngs=rngs or nnx.Rngs(0))

    def _coeffs(self, h: jnp.ndarray) -> jnp.ndarray:
        m, p = jnp.split(h, 2, axis=-1)
        return jnp.exp(jnp.clip(m, None, 10.0)) * jnp.cos(p)
