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

# Default OFF: the round-2 probe measured the stock Pallas kernel SLOWER than
# XLA at the CFM shapes (B32 H4 T1024 dh64 bf16: 5.7 ms vs 2.7 ms —
# docs/history.md).  bench.py A/Bs this switch; flip the default only with a
# measured win on real hardware.
_FLASH_ENABLED = False


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
    # kernel tiling: sublane-aligned sequence blocks, self-attention only
    if dh % 8 != 0 or tq % 128 != 0 or tq != tk:
        return False
    if mask is not None and mask.ndim != 4:
        return False
    # K/V for one (batch, head) must fit VMEM comfortably (~16 MB/core)
    if tk * dh * 4 * 2 > 4 * 1024 * 1024:
        return False
    return True


def _fused_attn_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref):
    """One (batch*head, q-block) program: K/V fully VMEM-resident, the
    (BQ, T) logits live and die in VMEM — zero T^2 HBM traffic."""
    q = q_ref[0]                    # (BQ, dh)
    k = k_ref[0]                    # (T, dh)
    v = v_ref[0]                    # (T, dh)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    neg = jnp.float32(-1e30)
    logits = logits + (1.0 - valid_ref[0].astype(jnp.float32))[None, :] * neg
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / s).astype(v.dtype)     # (BQ, T)
    o_ref[0] = jax.lax.dot_general(w, v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def _fused_attn_fwd_impl(q, k, v, valid, block_q: int = 256,
                         interpret: bool = False):
    """q/k/v: (BH, T, dh); valid: (BH, T) 1/0 float; -> (BH, T, dh).

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU) — used
    by the numerics tests in environments without a TPU."""
    from jax.experimental import pallas as pl

    bh, t, dh = q.shape
    bq = min(block_q, t)
    while t % bq:  # largest power-of-two divisor <= block_q
        bq //= 2
    grid = (bh, t // bq)
    return pl.pallas_call(
        _fused_attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t, dh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, dh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t, dh), q.dtype),
        interpret=interpret,
    )(q, k, v, valid)


@jax.custom_vjp
def _fused_attention(q, k, v, valid):
    return _fused_attn_fwd_impl(q, k, v, valid)


def _xla_softmax(q, k, valid):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
    logits = jnp.where(valid[:, None, :] > 0, logits, -1e30)
    return jax.nn.softmax(logits, axis=-1)


def _fused_attention_fwd(q, k, v, valid):
    return _fused_attn_fwd_impl(q, k, v, valid), (q, k, v, valid)


def _fused_attention_bwd(res, g):
    # backward recomputes the softmax in plain XLA: training batches are few
    # relative to the 30x-per-utterance inference loop the kernel exists for
    q, k, v, valid = res
    w = _xla_softmax(q, k, valid)                        # (BH, Tq, Tk) f32
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("bqk,bqd->bkd", w, gf)
    dw = jnp.einsum("bqd,bkd->bqk", gf, vf)
    dlog = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    scale = 1.0 / (q.shape[-1] ** 0.5)
    dq = jnp.einsum("bqk,bkd->bqd", dlog, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bqk,bqd->bkd", dlog, q.astype(jnp.float32)) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(valid))


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def flash_attention_fn(query, key, value, bias=None, mask=None,
                       broadcast_dropout: bool = True, dropout_rng=None,
                       dropout_rate: float = 0.0, deterministic: bool = False,
                       dtype=None, precision=None, module=None,
                       promote_dtype=None, is_causal: bool = False, **kw):
    """``attention_fn`` contract: q/k/v are (B, T, H, dh); returns (B, T, H, dh)."""
    if is_causal or not _flash_ok(query, key, bias, dropout_rate,
                                  deterministic, mask):
        return _nnx_attention.dot_product_attention(
            query, key, value, bias=bias, mask=mask,
            broadcast_dropout=broadcast_dropout, dropout_rng=dropout_rng,
            dropout_rate=dropout_rate, deterministic=deterministic,
            dtype=dtype, precision=precision, module=module,
            **({"promote_dtype": promote_dtype} if promote_dtype is not None else {}),
            is_causal=is_causal)

    b, t, h, dh = query.shape
    # (B, T, H, dh) -> (B*H, T, dh): one grid row per (batch, head)
    q = jnp.transpose(query, (0, 2, 1, 3)).reshape(b * h, t, dh)
    k = jnp.transpose(key, (0, 2, 1, 3)).reshape(b * h, t, dh)
    v = jnp.transpose(value, (0, 2, 1, 3)).reshape(b * h, t, dh)
    if mask is not None:
        # blocks build mask = valid[:,None,None,:] & valid[:,None,:,None];
        # recover the per-position validity vector (row 0 is always valid —
        # lengths >= 1 — so mask[:,0,0,:] IS the key validity)
        valid = jnp.repeat(mask[:, 0, 0, :].astype(jnp.float32), h, axis=0)
    else:
        valid = jnp.ones((b * h, t), jnp.float32)
    out = _fused_attention(q, k, v, valid)
    return jnp.transpose(out.reshape(b, h, t, dh),
                         (0, 2, 1, 3)).astype(query.dtype)
