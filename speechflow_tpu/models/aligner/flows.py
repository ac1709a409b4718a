"""Normalizing-flow layers for the Glow aligner decoder.

Capability parity with the reference FlowSpecDecoder internals
(tts/forced_alignment/model/{layers.py, blocks.py}: ActNorm, InvConvNear,
WN affine coupling): invertible transforms over (B, T, C) mel frames with
per-frame masks, returning log-determinants for the MLE loss. All layers are
jit-friendly (static shapes, no data-dependent control flow); the inverse pass
reuses the same modules with ``reverse=True``.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.utils.masks import sequence_mask

__all__ = ["ActNorm", "Inv1x1Conv", "AffineCoupling", "FlowSpecDecoder"]


class ActNorm(nnx.Module):
    """Per-channel affine with log-scale (data-dependent init is replaced by
    standard-normal-friendly zero init; training adapts quickly)."""

    def __init__(self, channels: int, rngs: nnx.Rngs = None):
        self.logs = nnx.Param(jnp.zeros((channels,)))
        self.bias = nnx.Param(jnp.zeros((channels,)))

    def __call__(self, x, mask, reverse: bool = False):
        logs, bias = self.logs[...], self.bias[...]
        if reverse:
            y = (x - bias) * jnp.exp(-logs)
            return y * mask, None
        y = (x * jnp.exp(logs) + bias) * mask
        logdet = jnp.sum(logs) * jnp.sum(mask[..., 0], axis=-1)
        return y, logdet


class Inv1x1Conv(nnx.Module):
    """Invertible channel mixing in groups of ``n_split`` channels
    (reference InvConvNear): x reshaped to (..., C/n, n) and multiplied by an
    orthogonal-initialized n x n matrix."""

    def __init__(self, channels: int, n_split: int = 4, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        assert channels % n_split == 0
        self.n_split = n_split
        q, _ = np.linalg.qr(np.random.default_rng(0).normal(size=(n_split, n_split)))
        self.weight = nnx.Param(jnp.asarray(q.astype(np.float32)))

    def __call__(self, x, mask, reverse: bool = False):
        b, t, c = x.shape
        n = self.n_split
        w = self.weight[...]
        xg = x.reshape(b, t, c // n, n)
        if reverse:
            w_inv = jnp.linalg.inv(w)
            y = jnp.einsum("btgn,nm->btgm", xg, w_inv).reshape(b, t, c)
            return y * mask, None
        y = jnp.einsum("btgn,nm->btgm", xg, w).reshape(b, t, c) * mask
        _, logabsdet = jnp.linalg.slogdet(w)
        logdet = logabsdet * (c // n) * jnp.sum(mask[..., 0], axis=-1)
        return y, logdet


class AffineCoupling(nnx.Module):
    """Affine coupling: half the channels parameterize scale/shift of the
    other half through a dilated conv stack with optional global condition
    (reference WN coupling, simplified gated convs)."""

    def __init__(self, channels: int, hidden: int = 192, n_layers: int = 3,
                 kernel_size: int = 5, cond_dim: tp.Optional[int] = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        half = channels // 2
        self.half = half
        self.pre = nnx.Conv(half, hidden, (1,), rngs=rngs)
        self.convs = nnx.List([
            nnx.Conv(hidden, 2 * hidden, (kernel_size,), kernel_dilation=(2 ** i,),
                     padding="SAME", rngs=rngs)
            for i in range(n_layers)
        ])
        self.cond_proj = nnx.Linear(cond_dim, 2 * hidden * n_layers, rngs=rngs) \
            if cond_dim else None
        self.post = nnx.Conv(hidden, channels, (1,),
                             kernel_init=nnx.initializers.zeros_init(), rngs=rngs)
        self.n_layers = n_layers
        self.hidden = hidden

    def _net(self, xa, mask, cond):
        h = self.pre(xa) * mask
        cond_parts = None
        if self.cond_proj is not None and cond is not None:
            cond_parts = jnp.split(self.cond_proj(cond)[:, None, :], self.n_layers, axis=-1)
        for i, conv in enumerate(self.convs):
            u = conv(h)
            if cond_parts is not None:
                u = u + cond_parts[i]
            a, g = jnp.split(u, 2, axis=-1)
            h = (h + jnp.tanh(a) * jax.nn.sigmoid(g)) * mask  # gated residual
        out = self.post(h)
        logs, shift = out[..., : self.half], out[..., self.half:]
        logs = jnp.tanh(logs)  # bounded scales keep the flow stable
        return logs, shift

    def __call__(self, x, mask, cond=None, reverse: bool = False):
        xa, xb = x[..., : self.half], x[..., self.half:]
        logs, shift = self._net(xa, mask, cond)
        if reverse:
            yb = (xb - shift) * jnp.exp(-logs) * mask
            return jnp.concatenate([xa, yb], axis=-1), None
        yb = (xb * jnp.exp(logs) + shift) * mask
        logdet = jnp.sum(logs * mask, axis=(1, 2))
        return jnp.concatenate([xa, yb], axis=-1), logdet


class FlowSpecDecoder(nnx.Module):
    """Squeeze-by-2 + K x (ActNorm -> Inv1x1 -> AffineCoupling) over mel frames
    (reference: model/glow_tts.py FlowSpecDecoder)."""

    def __init__(self, n_mels: int, n_flows: int = 6, hidden: int = 192,
                 n_split: int = 4, cond_dim: tp.Optional[int] = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        c = n_mels * 2  # after time-squeeze
        self.n_mels = n_mels
        self.actnorms = nnx.List([ActNorm(c, rngs=rngs) for _ in range(n_flows)])
        self.invconvs = nnx.List([Inv1x1Conv(c, n_split, rngs=rngs) for _ in range(n_flows)])
        self.couplings = nnx.List([
            AffineCoupling(c, hidden, cond_dim=cond_dim, rngs=rngs) for _ in range(n_flows)
        ])

    @staticmethod
    def _squeeze(x, lengths):
        b, t, c = x.shape
        t2 = t // 2
        x = x[:, : t2 * 2].reshape(b, t2, 2 * c)
        return x, lengths // 2

    @staticmethod
    def _unsqueeze(x):
        b, t2, c2 = x.shape
        return x.reshape(b, t2 * 2, c2 // 2)

    def __call__(self, mel, mel_lengths, cond=None, reverse: bool = False):
        x, lens2 = self._squeeze(mel, mel_lengths)
        mask = sequence_mask(lens2, x.shape[1])[..., None].astype(x.dtype)
        total_logdet = jnp.zeros((x.shape[0],))
        stages = list(zip(self.actnorms, self.invconvs, self.couplings))
        if reverse:
            for an, ic, cp in reversed(stages):
                x, _ = cp(x, mask, cond, reverse=True)
                x, _ = ic(x, mask, reverse=True)
                x, _ = an(x, mask, reverse=True)
            return self._unsqueeze(x), None
        for an, ic, cp in stages:
            x, ld1 = an(x, mask)
            x, ld2 = ic(x, mask)
            x, ld3 = cp(x, mask, cond)
            total_logdet = total_logdet + ld1 + ld2 + ld3
        return self._unsqueeze(x), total_logdet
