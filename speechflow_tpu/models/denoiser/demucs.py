"""Trainable waveform denoiser (DEMUCS/dns64-class).

The reference's DenoisingProcessor loads facebook's pretrained dns64 demucs
(speechflow/data_pipeline/datasample_processors/audio_processors.py:427-443).
No pretrained weights are downloadable offline, so the framework ships the
architecture as a trainable model: a strided-conv U-Net over the raw
waveform — encoder layers with GLU gates, a sequence-modeling bottleneck
(bi-GRU), and a transposed-conv decoder with skip connections — trained on
synthetic noisy mixtures (clean corpus + the augmentation noise generators).
The standard deviation of the input is normalized away and restored on
output, matching demucs' floor-normalization trick.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.training.base_model import BaseModelParams

__all__ = ["WaveDenoiserParams", "WaveDenoiser", "denoiser_criterion"]


class WaveDenoiserParams(BaseModelParams):
    channels: int = 48
    depth: int = 4
    kernel_size: int = 8
    stride: int = 4
    growth: float = 2.0
    use_rnn: bool = True
    sample_rate: int = 24000


class WaveDenoiser(nnx.Module):
    def __init__(self, params: WaveDenoiserParams, rngs: tp.Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        p = params
        self.p = p
        ch_in, ch = 1, p.channels
        self.encoder = nnx.List([])
        self.decoder = nnx.List([])
        chs = []
        for _ in range(p.depth):
            self.encoder.append(nnx.List([
                nnx.Conv(ch_in, ch, (p.kernel_size,), strides=(p.stride,),
                         padding="SAME", rngs=rngs),
                nnx.Conv(ch, 2 * ch, (1,), rngs=rngs),  # GLU gate
            ]))
            chs.append((ch_in, ch))
            ch_in, ch = ch, int(ch * p.growth)
        bottleneck = ch_in
        self.use_rnn = p.use_rnn
        if p.use_rnn:
            half = bottleneck // 2
            self.fwd = nnx.RNN(nnx.GRUCell(bottleneck, half, rngs=rngs))
            self.bwd = nnx.RNN(nnx.GRUCell(bottleneck, bottleneck - half, rngs=rngs),
                               reverse=True, keep_order=True)
        for dec_in, dec_out in reversed(chs):
            self.decoder.append(nnx.List([
                nnx.Conv(dec_out, 2 * dec_out, (1,), rngs=rngs),  # GLU gate
                nnx.ConvTranspose(dec_out, dec_in, (p.kernel_size,),
                                  strides=(p.stride,), padding="SAME", rngs=rngs),
            ]))
        self.total_stride = p.stride**p.depth

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, T) noisy -> (B, T) denoised. T should be a multiple of
        stride**depth (the data plane's sample_multiple handles this)."""
        std = jnp.std(wav, axis=-1, keepdims=True) + 1e-5
        x = (wav / std)[..., None]  # (B, T, 1)
        n = x.shape[1]
        pad = (-n) % self.total_stride
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        skips = []
        for conv, gate in self.encoder:
            x = nnx.relu(conv(x))
            x = nnx.glu(gate(x), axis=-1)
            skips.append(x)
        if self.use_rnn:
            x = jnp.concatenate([self.fwd(x), self.bwd(x)], axis=-1)
        for (gate, deconv), skip in zip(self.decoder, reversed(skips)):
            x = x + skip[:, : x.shape[1]]
            x = nnx.glu(gate(x), axis=-1)
            x = deconv(x)
        x = x[:, :n, 0]
        return x * std


def denoiser_criterion(stft_weight: float = 0.5):
    """L1 waveform + multi-resolution STFT loss for Trainer."""
    from speechflow_tpu.models.vocoder.criterion import multires_stft_loss

    def criterion(outputs, targets, step):
        clean = targets["clean"][..., : outputs.shape[-1]]
        losses = {"l1": jnp.mean(jnp.abs(outputs - clean))}
        if stft_weight > 0:
            losses["stft"] = stft_weight * multires_stft_loss(outputs, clean)
        return losses

    return criterion
