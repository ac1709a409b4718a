"""Vocoder backbones.

Capability parity with the reference VocosBackbone (ConvNeXt-1D,
tts/vocoders/vocos/modules/backbones/vocos.py:26): embedding conv (k=7) ->
N ConvNeXt blocks (depthwise k=7 conv -> LayerNorm -> pointwise MLP with GELU
-> learned per-channel residual scale) -> final LayerNorm. Channels-last
throughout (TPU layout); optional AdaLayerNorm conditioning on a global
embedding (speaker/style) mirrors the reference's conditional variant.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import nnx

__all__ = ["ConvNeXtBlock", "VocosBackbone", "DummyBackbone"]


class ConvNeXtBlock(nnx.Module):
    def __init__(self, dim: int, mlp_ratio: int = 3, kernel_size: int = 7,
                 layer_scale: float = 1e-6, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.dwconv = nnx.Conv(dim, dim, (kernel_size,), padding="SAME",
                               feature_group_count=dim, rngs=rngs)
        self.norm = nnx.LayerNorm(dim, rngs=rngs)
        self.pw1 = nnx.Linear(dim, mlp_ratio * dim, rngs=rngs)
        self.pw2 = nnx.Linear(mlp_ratio * dim, dim, rngs=rngs)
        self.gamma = nnx.Param(layer_scale * jnp.ones((dim,)))

    def __call__(self, x: jnp.ndarray, cond: tp.Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from speechflow_tpu.ops.signal import depthwise_conv1d

        res = x
        # shifted-add depthwise conv: feature_group_count=C grouped convs
        # lower pathologically on TPU (see ops/anti_alias.py); same params,
        # same numerics, K fused VPU FMAs instead.  Honor the layer's compute
        # dtype (set_compute_dtype) — reading the raw fp32 master kernel
        # against bf16 activations would silently promote the op to fp32.
        dt = self.dwconv.dtype or x.dtype
        x = depthwise_conv1d(x.astype(dt), self.dwconv.kernel[...].astype(dt),
                             self.dwconv.bias[...].astype(dt))
        x = self.norm(x)
        x = self.pw2(nnx.gelu(self.pw1(x)))
        # cast the residual scale: a raw fp32 gamma would promote the whole
        # block output (and its HBM write) back to fp32 under bf16 compute
        return res + self.gamma[...].astype(x.dtype) * x


class VocosBackbone(nnx.Module):
    def __init__(self, dim_in: int = 100, dim: int = 512, n_layers: int = 8,
                 mlp_ratio: int = 3, kernel_size: int = 7,
                 cond_dim: tp.Optional[int] = None, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.embed = nnx.Conv(dim_in, dim, (7,), padding="SAME", rngs=rngs)
        self.norm_in = nnx.LayerNorm(dim, rngs=rngs)
        self.blocks = nnx.List([
            ConvNeXtBlock(dim, mlp_ratio, kernel_size, rngs=rngs) for _ in range(n_layers)
        ])
        self.norm_out = nnx.LayerNorm(dim, rngs=rngs)
        self.cond_proj = None
        if cond_dim is not None:
            self.cond_proj = nnx.Linear(cond_dim, dim, rngs=rngs)
        self.dim = dim

    def __call__(self, x: jnp.ndarray, cond: tp.Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """(B, T, dim_in) -> (B, T, dim)."""
        x = self.embed(x)
        x = self.norm_in(x)
        if self.cond_proj is not None and cond is not None:
            x = x + self.cond_proj(cond)[:, None, :]
        for blk in self.blocks:
            x = blk(x)
        return self.norm_out(x)


class DummyBackbone(nnx.Module):
    """Identity (reference: backbones DummyBackbone) — heads consume features directly."""

    def __init__(self, dim_in: int = 100, rngs: nnx.Rngs = None):
        self.dim = dim_in

    def __call__(self, x: jnp.ndarray, cond=None) -> jnp.ndarray:
        return x
