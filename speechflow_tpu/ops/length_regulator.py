"""Length regulation as masked matmuls (MXU-native).

Replaces the reference regulators (tts/acoustic_models/modules/common/
length_regulators.py:13,53). Instead of per-sample ``repeat_interleave`` (a
dynamic-shape gather), both the hard and soft variants build a (B, T_out, N)
alignment matrix from cumulative durations and expand content with a single
batched matmul — static shapes, fully jit/pjit-friendly, differentiable in the
soft case.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp

__all__ = ["duration_attention", "length_regulate_hard", "length_regulate_soft"]


def duration_attention(durations: jnp.ndarray, t_out: int) -> jnp.ndarray:
    """Hard one-hot alignment (B, t_out, N) from integer durations (B, N).

    Frame t attends token n iff cum[n-1] <= t < cum[n]. Frames beyond the total
    duration attend nothing (zero rows) — they're padding.
    """
    cum = jnp.cumsum(durations.astype(jnp.float32), axis=-1)  # (B, N)
    prev = cum - durations.astype(jnp.float32)
    t = jnp.arange(t_out, dtype=jnp.float32)[None, :, None]  # (1, T, 1)
    attn = (t >= prev[:, None, :]) & (t < cum[:, None, :])
    return attn.astype(jnp.float32)


def length_regulate_hard(
    content: jnp.ndarray,
    durations: jnp.ndarray,
    t_out: int,
) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N, D) content + (B, N) durations -> ((B, t_out, D), attn)."""
    attn = duration_attention(durations, t_out)
    return jnp.matmul(attn, content), attn


def length_regulate_soft(
    content: jnp.ndarray,
    durations: jnp.ndarray,
    t_out: int,
    sigma: float = 10.0,
    token_mask: tp.Optional[jnp.ndarray] = None,
) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable soft regulator (reference SoftLengthRegulator, :53).

    Gaussian attention from output-frame positions to token centers derived
    from (possibly fractional) durations: w[t, n] ∝ exp(-sigma * (t - c_n)^2 / d_n)
    normalized over n. Padding tokens (mask False) receive zero weight.
    """
    dur = durations.astype(jnp.float32)
    cum = jnp.cumsum(dur, axis=-1)
    centers = cum - 0.5 * dur  # (B, N)
    t = jnp.arange(t_out, dtype=jnp.float32)[None, :, None] + 0.5
    dist2 = (t - centers[:, None, :]) ** 2
    width = jnp.maximum(dur[:, None, :], 1.0)
    logits = -sigma * dist2 / width
    if token_mask is not None:
        logits = jnp.where(token_mask[:, None, :], logits, -1e9)
    attn = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    attn = attn / jnp.maximum(attn.sum(axis=-1, keepdims=True), 1e-9)
    return jnp.matmul(attn, content), attn
