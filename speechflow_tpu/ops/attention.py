"""Fused (flash) attention for the transformer blocks.

Why: the hot inference program — the CFM Euler loop — runs the DiT estimator
30x per utterance; with XLA's default attention each layer materializes the
(B, H, T, T) logits in HBM (T=1024 frames -> ~0.5 GB of traffic per layer per
step), which measured as the dominant cost of the acoustic stage (bench r3:
~11 ms per CFM step vs ~0.5 ms roofline).  The Pallas TPU flash-attention
kernel (jax.experimental.pallas.ops.tpu.flash_attention) computes the softmax
blockwise in VMEM and never writes the T^2 tensor.

This module exposes ``flash_attention_fn``, a drop-in ``attention_fn`` for
``nnx.MultiHeadAttention``: on TPU with supported shapes it runs the Pallas
kernel (forward + custom-vjp backward, so training also benefits); anywhere
else — CPU tests, the virtual-device mesh dryrun, attention with bias or
dropout — it falls back to flax's reference dot-product attention.  Length
masking maps onto the kernel's SegmentIds (valid=1, pad=0: pads only attend
to pads, and padded positions are masked downstream anyway).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax.nnx.nn import attention as _nnx_attention

__all__ = ["flash_attention_fn", "use_flash_attention"]

_FLASH_ENABLED = True


def use_flash_attention(enabled: bool) -> None:
    """Process-wide switch (e.g. to A/B the kernel in benchmarks)."""
    global _FLASH_ENABLED
    _FLASH_ENABLED = enabled


def _flash_ok(query, key, bias, dropout_rate, deterministic, mask) -> bool:
    if not _FLASH_ENABLED or bias is not None:
        return False
    if dropout_rate > 0.0 and not deterministic:
        return False  # the Pallas kernel has no dropout
    try:
        platform = query.devices().pop().platform if hasattr(query, "devices") \
            else jax.default_backend()
    except Exception:  # tracers carry no devices; trust the default backend
        platform = jax.default_backend()
    if platform != "tpu":
        return False
    b, tq, h, dh = query.shape
    tk = key.shape[1]
    # kernel tiling: lane-aligned head dim, sublane-aligned sequence blocks
    if dh % 64 != 0 or tq % 128 != 0 or tk % 128 != 0 or tq != tk:
        return False
    if mask is not None and mask.ndim != 4:
        return False
    return True


def flash_attention_fn(query, key, value, bias=None, mask=None,
                       broadcast_dropout: bool = True, dropout_rng=None,
                       dropout_rate: float = 0.0, deterministic: bool = False,
                       dtype=None, precision=None, module=None,
                       promote_dtype=None, is_causal: bool = False, **kw):
    """``attention_fn`` contract: q/k/v are (B, T, H, dh); returns (B, T, H, dh)."""
    if not _flash_ok(query, key, bias, dropout_rate, deterministic, mask):
        return _nnx_attention.dot_product_attention(
            query, key, value, bias=bias, mask=mask,
            broadcast_dropout=broadcast_dropout, dropout_rng=dropout_rng,
            dropout_rate=dropout_rate, deterministic=deterministic,
            dtype=dtype, precision=precision, module=module,
            **({"promote_dtype": promote_dtype} if promote_dtype is not None else {}),
            is_causal=is_causal)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, t, h, dh = query.shape
    q = jnp.transpose(query, (0, 2, 1, 3))
    k = jnp.transpose(key, (0, 2, 1, 3))
    v = jnp.transpose(value, (0, 2, 1, 3))
    segment_ids = None
    if mask is not None:
        # blocks build mask = valid[:,None,None,:] & valid[:,None,:,None];
        # recover the per-position validity vector (row 0 is always valid —
        # lengths >= 1 — so mask[:,0,0,:] IS the key validity)
        valid = mask[:, 0, 0, :].astype(jnp.int32)
        segment_ids = fa.SegmentIds(q=valid, kv=valid)
    out = fa.flash_attention(q, k, v, segment_ids=segment_ids,
                             causal=is_causal, sm_scale=1.0 / (dh ** 0.5))
    return jnp.transpose(out, (0, 2, 1, 3)).astype(query.dtype)
