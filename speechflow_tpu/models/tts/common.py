"""Common building blocks for the acoustic-model kit.

Capability parity with the reference common modules
(tts/acoustic_models/modules/common/: blocks.py FFT/MHA, layers.py Conv,
pos_encoders.py:85 RoPE, conditional_layers/* cat|add|adanorm|film dispatch,
vector_quantizer.py:19, inverse_grad.py gradient reversal, diffusion
transformer DiT blocks): channels-last, masked, static-shape nnx modules.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.ops.attention import flash_attention_fn
from speechflow_tpu.utils.masks import sequence_mask

__all__ = [
    "ConvBlock", "ConvStack", "PreNet", "TransformerBlock", "DiTBlock",
    "AdaLayerNorm", "FiLM", "ConditionalLayer", "VarianceEmbedding",
    "VectorQuantizer", "MixStyle", "grad_reverse", "sinusoidal_embedding",
    "rope_rotate",
]


def sinusoidal_embedding(positions: jnp.ndarray, dim: int,
                         max_period: float = 10000.0) -> jnp.ndarray:
    """(...,) -> (..., dim) sin/cos embedding (timesteps, positions)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    args = positions[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def rope_rotate(x: jnp.ndarray, max_period: float = 10000.0,
                positions: tp.Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Rotary position embedding on (..., T, D) (reference: pos_encoders.py:85).

    ``positions`` (shape (T,), may be traced) overrides the default 0..T-1 —
    used by KV-cached decoding to rotate a single-step query at its absolute
    sequence position.
    """
    t, d = x.shape[-2], x.shape[-1]
    half = d // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    pos = jnp.arange(t) if positions is None else positions
    angles = pos[:, None] * freqs[None, :]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x[..., :half], x[..., half:2 * half]
    rot = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    if d % 2:
        rot = jnp.concatenate([rot, x[..., -1:]], axis=-1)
    return rot


class ConvBlock(nnx.Module):
    """Conv1d + norm + activation + dropout (reference: layers.py:15 Conv)."""

    def __init__(self, dim_in: int, dim_out: int, kernel_size: int = 5,
                 dilation: int = 1, causal: bool = False, activation: str = "relu",
                 dropout: float = 0.1, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        pad = "CAUSAL" if causal else "SAME"
        self.conv = nnx.Conv(dim_in, dim_out, (kernel_size,), padding=pad,
                             kernel_dilation=(dilation,), rngs=rngs)
        self.norm = nnx.LayerNorm(dim_out, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)
        self.activation = activation

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = self.conv(x)
        x = self.norm(x)
        if self.activation == "relu":
            x = nnx.relu(x)
        elif self.activation == "gelu":
            x = nnx.gelu(x)
        elif self.activation == "tanh":
            x = jnp.tanh(x)
        return self.dropout(x, deterministic=deterministic)


class ConvStack(nnx.Module):
    def __init__(self, dim_in: int, dim: int, dim_out: int, n_layers: int = 3,
                 kernel_size: int = 5, dropout: float = 0.1, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        dims = [dim_in] + [dim] * (n_layers - 1) + [dim_out]
        self.blocks = nnx.List([
            ConvBlock(dims[i], dims[i + 1], kernel_size, dropout=dropout, rngs=rngs)
            for i in range(n_layers)
        ])

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for blk in self.blocks:
            x = blk(x, deterministic=deterministic)
        return x


class PreNet(nnx.Module):
    """Bottleneck MLP prenet (reference: ConvPrenet/blocks)."""

    def __init__(self, dim_in: int, dim: int = 256, dim_out: int = 256,
                 dropout: float = 0.5, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.l1 = nnx.Linear(dim_in, dim, rngs=rngs)
        self.l2 = nnx.Linear(dim, dim_out, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = self.dropout(nnx.relu(self.l1(x)), deterministic=deterministic)
        return self.dropout(nnx.relu(self.l2(x)), deterministic=deterministic)


class AdaLayerNorm(nnx.Module):
    """LayerNorm with condition-predicted scale/shift (reference:
    conditional_layers AdaLayerNorm; also the DiT AdaNorm)."""

    def __init__(self, dim: int, cond_dim: int, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.norm = nnx.LayerNorm(dim, use_bias=False, use_scale=False, rngs=rngs)
        self.proj = nnx.Linear(cond_dim, 2 * dim,
                               kernel_init=nnx.initializers.zeros_init(), rngs=rngs)

    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        scale, shift = jnp.split(self.proj(cond), 2, axis=-1)
        while scale.ndim < x.ndim:
            scale, shift = scale[:, None], shift[:, None]
        return self.norm(x) * (1.0 + scale) + shift


class FiLM(nnx.Module):
    def __init__(self, dim: int, cond_dim: int, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.proj = nnx.Linear(cond_dim, 2 * dim, rngs=rngs)

    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        scale, shift = jnp.split(self.proj(cond), 2, axis=-1)
        while scale.ndim < x.ndim:
            scale, shift = scale[:, None], shift[:, None]
        return x * (1.0 + scale) + shift


class ConditionalLayer(nnx.Module):
    """cat/add/adanorm/film condition dispatch (reference:
    conditional_layers/conditional_layer.py:21)."""

    def __init__(self, method: str, dim: int, cond_dim: int, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.method = method
        if method == "cat":
            self.proj = nnx.Linear(dim + cond_dim, dim, rngs=rngs)
        elif method == "add":
            self.proj = nnx.Linear(cond_dim, dim, rngs=rngs)
        elif method == "adanorm":
            self.layer = AdaLayerNorm(dim, cond_dim, rngs=rngs)
        elif method == "film":
            self.layer = FiLM(dim, cond_dim, rngs=rngs)
        else:
            raise ValueError(f"unknown condition method: {method}")

    def __call__(self, x: jnp.ndarray, cond: tp.Optional[jnp.ndarray]) -> jnp.ndarray:
        if cond is None:
            return x
        if cond.ndim == 2:
            cond_t = jnp.broadcast_to(cond[:, None, :], (x.shape[0], x.shape[1], cond.shape[-1]))
        else:
            cond_t = cond
        if self.method == "cat":
            return self.proj(jnp.concatenate([x, cond_t], axis=-1))
        if self.method == "add":
            return x + self.proj(cond_t)
        return self.layer(x, cond)


class TransformerBlock(nnx.Module):
    """Pre-LN MHA + FFN with optional RoPE (reference FFT block, blocks.py)."""

    def __init__(self, dim: int, n_heads: int = 4, ffn_mult: int = 4,
                 dropout: float = 0.1, use_rope: bool = True, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.norm1 = nnx.LayerNorm(dim, rngs=rngs)
        self.attn = nnx.MultiHeadAttention(
            num_heads=n_heads, in_features=dim, qkv_features=dim,
            dropout_rate=dropout, decode=False,
            attention_fn=flash_attention_fn, rngs=rngs)
        self.norm2 = nnx.LayerNorm(dim, rngs=rngs)
        self.ffn1 = nnx.Linear(dim, ffn_mult * dim, rngs=rngs)
        self.ffn2 = nnx.Linear(ffn_mult * dim, dim, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)
        self.use_rope = use_rope

    def __call__(self, x: jnp.ndarray, mask: tp.Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        h = self.norm1(x)
        if self.use_rope:
            h = rope_rotate(h)
        attn_mask = None
        if mask is not None:
            attn_mask = mask[:, None, None, :] & mask[:, None, :, None]
        h = self.attn(h, h, h, mask=attn_mask, deterministic=deterministic)
        x = x + self.dropout(h, deterministic=deterministic)
        h = self.ffn2(nnx.gelu(self.ffn1(self.norm2(x))))
        return x + self.dropout(h, deterministic=deterministic)


class DiTBlock(nnx.Module):
    """Diffusion-transformer block: AdaNorm(cond)-modulated attention + MLP
    with gated residuals (reference: common/diffusion_transformer.py DiTConv)."""

    def __init__(self, dim: int, cond_dim: int, n_heads: int = 4, ffn_mult: int = 4,
                 dropout: float = 0.0, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.mod = nnx.Linear(cond_dim, 6 * dim,
                              kernel_init=nnx.initializers.zeros_init(), rngs=rngs)
        self.norm1 = nnx.LayerNorm(dim, use_bias=False, use_scale=False, rngs=rngs)
        self.attn = nnx.MultiHeadAttention(num_heads=n_heads, in_features=dim,
                                           qkv_features=dim, dropout_rate=dropout,
                                           decode=False,
                                           attention_fn=flash_attention_fn, rngs=rngs)
        self.norm2 = nnx.LayerNorm(dim, use_bias=False, use_scale=False, rngs=rngs)
        self.ffn1 = nnx.Linear(dim, ffn_mult * dim, rngs=rngs)
        self.ffn2 = nnx.Linear(ffn_mult * dim, dim, rngs=rngs)

    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray,
                 mask: tp.Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        m = self.mod(cond)[:, None, :]
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(m, 6, axis=-1)
        h = self.norm1(x) * (1 + sc1) + sh1
        h = rope_rotate(h)
        attn_mask = None
        if mask is not None:
            attn_mask = mask[:, None, None, :] & mask[:, None, :, None]
        x = x + g1 * self.attn(h, h, h, mask=attn_mask, deterministic=deterministic)
        h = self.norm2(x) * (1 + sc2) + sh2
        x = x + g2 * self.ffn2(nnx.gelu(self.ffn1(h)))
        return x


class VarianceEmbedding(nnx.Module):
    """Bucketize a scalar variance into n_bins over an interval and embed
    (reference: common/blocks.py:25)."""

    def __init__(self, interval: tp.Tuple[float, float] = (0.0, 880.0),
                 n_bins: int = 256, emb_dim: int = 64, log_scale: bool = False,
                 rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.interval = interval
        self.n_bins = n_bins
        self.log_scale = log_scale
        self.emb = nnx.Embed(n_bins, emb_dim, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        lo, hi = self.interval
        if self.log_scale:
            x = jnp.log1p(jnp.maximum(x, 0.0))
            lo, hi = np.log1p(max(lo, 0.0)), np.log1p(hi)
        idx = jnp.clip(((x - lo) / (hi - lo) * self.n_bins).astype(jnp.int32),
                       0, self.n_bins - 1)
        return self.emb(idx)


class MixStyle(nnx.Module):
    """Feature-statistics mixing for domain generalization (Zhou et al.,
    ICLR 2021; reference: modules/common/mixstyle.py). Normalizes each
    sequence by its own time-axis mean/std, then denormalizes with a
    Beta-mixed convex combination of its stats and a shuffled batch
    partner's — jit-friendly: the per-call apply/skip gate is a traced
    bernoulli `where`, not Python control flow."""

    def __init__(self, p: float = 0.5, alpha: float = 0.1, eps: float = 1e-6,
                 rngs: nnx.Rngs = None):
        self.p = p
        self.alpha = alpha
        self.eps = eps
        self.rngs = rngs or nnx.Rngs(0)

    def __call__(self, x: jnp.ndarray, training: bool = True) -> jnp.ndarray:
        if not training:
            return x
        k_beta, k_perm, k_gate = jax.random.split(self.rngs.params(), 3)
        b = x.shape[0]
        mu = jax.lax.stop_gradient(jnp.mean(x, axis=1, keepdims=True))
        sig = jax.lax.stop_gradient(
            jnp.sqrt(jnp.var(x, axis=1, keepdims=True) + self.eps))
        x_normed = (x - mu) / sig
        lmda = jax.random.beta(k_beta, self.alpha, self.alpha, (b, 1, 1))
        perm = jax.random.permutation(k_perm, b)
        mu_mix = mu * lmda + mu[perm] * (1.0 - lmda)
        sig_mix = sig * lmda + sig[perm] * (1.0 - lmda)
        return jnp.where(jax.random.bernoulli(k_gate, self.p),
                         x_normed * sig_mix + mu_mix, x)


class VectorQuantizer(nnx.Module):
    """VQ layer with EMA-free straight-through estimator and commitment loss
    (reference: common/vector_quantizer.py:19)."""

    def __init__(self, codebook_size: int = 256, dim: int = 256,
                 beta: float = 0.25, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        # unit-scale init matches normalized encoder latents (tiny uniform init
        # makes initial distances huge and the codebook loss explode)
        init = nnx.initializers.normal(stddev=1.0)
        self.codebook = nnx.Param(init(rngs.params(), (codebook_size, dim)))
        self.beta = beta

    def __call__(self, x: jnp.ndarray) -> tp.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cb = self.codebook[...]
        d = (jnp.sum(x**2, -1, keepdims=True)
             - 2 * jnp.einsum("...d,kd->...k", x, cb)
             + jnp.sum(cb**2, -1)[None, None, :])
        idx = jnp.argmin(d, axis=-1)
        q = cb[idx]
        commit = jnp.mean((jax.lax.stop_gradient(q) - x) ** 2)
        codebook_loss = jnp.mean((q - jax.lax.stop_gradient(x)) ** 2)
        vq_loss = codebook_loss + self.beta * commit
        q = x + jax.lax.stop_gradient(q - x)  # straight-through
        return q, idx, vq_loss


@jax.custom_vjp
def grad_reverse(x: jnp.ndarray, scale: float = 1.0):
    return x


def _gr_fwd(x, scale):
    return x, scale


def _gr_bwd(scale, g):
    return (-scale * g, None)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)
