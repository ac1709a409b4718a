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
kernel; anywhere else — CPU tests, the virtual-device mesh dryrun, the
training path (non-deterministic), attention with bias — it falls back to
flax's reference dot-product attention.  Length masking: padded KEYS are
masked out of every softmax row and padded QUERY outputs are zeroed
(slightly stronger than flax's masked softmax, which leaves a uniform
average of all values at fully-masked rows).  Valid positions agree with
the XLA path to ~1e-3 in bf16; note that under *predicted* durations a
1e-3 perturbation can shift a hard length-regulator frame boundary, so
end-to-end mel comparisons between the two paths are only meaningful
teacher-forced.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax.nnx.nn import attention as _nnx_attention

__all__ = ["flash_attention_fn", "use_flash_attention"]

# Default ON for the inference (deterministic) path: measured on a real v5e
# chip with the relay overhead amortized (50 calls inside one scan program),
# this kernel beats XLA's fused attention forward ~1.9x at the CFM shapes —
# B32 H4 T1024 dh64 bf16: 1.17 ms vs 2.20 ms; with CFG's doubled batch (B64):
# 2.05 ms vs 4.18 ms.  Training stays on XLA: the fwd+bwd total measured
# SLOWER through the recompute VJP (5.27 ms vs 4.53 ms at B32), so
# ``_flash_ok`` requires ``deterministic=True``.  (The round-2 probe that
# measured the *stock* Pallas flash kernel slower — 5.7 ms vs 2.7 ms — was
# per-dispatch timing dominated by the ~35 ms relay round trip.)
_FLASH_ENABLED = True


def use_flash_attention(enabled: bool) -> None:
    """Process-wide switch (e.g. to A/B the kernel in benchmarks)."""
    global _FLASH_ENABLED
    _FLASH_ENABLED = enabled


def _flash_ok(query, key, bias, dropout_rate, deterministic, mask) -> bool:
    if not _FLASH_ENABLED or bias is not None:
        return False
    if not deterministic:
        # training path: no dropout in the kernel, and the XLA-recompute
        # backward measured slower than XLA's own fused attention bwd
        return False
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
    # the (BH, T) validity matrix rides VMEM whole (Mosaic's sublane rule
    # forbids a (1, T) block) — bound it too
    if b * h * tk * 4 > 4 * 1024 * 1024:
        return False
    return True


def _fused_attn_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref):
    """One (batch*head, q-block) program: K/V fully VMEM-resident, the
    (BQ, T) logits live and die in VMEM — zero T^2 HBM traffic.

    ``valid_ref`` is the whole (BH, T) validity matrix (Mosaic rejects a
    (1, T) block — leading block dims must be sublane-divisible — so the
    full array rides VMEM and each program dynamically picks its row)."""
    from jax.experimental import pallas as pl

    q = q_ref[0]                    # (BQ, dh)
    k = k_ref[0]                    # (T, dh)
    v = v_ref[0]                    # (T, dh)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    neg = jnp.float32(-1e30)
    valid_row = valid_ref[pl.program_id(0)]          # (T,)
    logits = logits + (1.0 - valid_row.astype(jnp.float32))[None, :] * neg
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
            pl.BlockSpec((bh, t), lambda i, j: (0, 0)),
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
    # zero padded-query rows: the kernel (like XLA's masked softmax) leaves
    # arbitrary values there, and zeros are the safe thing for any downstream
    # op that forgets to re-mask
    out = out * valid[..., None].astype(out.dtype)
    return jnp.transpose(out.reshape(b, h, t, dh),
                         (0, 2, 1, 3)).astype(query.dtype)
