"""Device-side (jax) mask/sequence helpers.

Capability parity with the reference tensor utils (speechflow/utils/tensor_utils.py:39
``get_mask_from_lengths`` et al.), expressed as jit-friendly jnp ops used by
every model component to mask padded positions.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["sequence_mask", "apply_mask", "masked_mean", "lengths_from_mask"]


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, T) bool mask; True at valid positions."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos < lengths[:, None]


def apply_mask(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded positions; mask is (B, T), x is (B, T, ...) or (B, T)."""
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    return x * mask.astype(x.dtype)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None, eps: float = 1e-9) -> jnp.ndarray:
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    m = mask.astype(x.dtype)
    num = jnp.sum(x * m, axis=axis)
    den = jnp.sum(m, axis=axis) + eps
    return num / den


def lengths_from_mask(mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(mask.astype(jnp.int32), axis=-1)
