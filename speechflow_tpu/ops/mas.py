"""Monotonic Alignment Search as a wavefront scan on device.

Replaces the reference's CPU numpy/numba DP (tts/forced_alignment/model/
utils.py:53 ``maximum_path``, :199 ``mas_width1``, :229 ``b_mas``) with a
``jax.lax.scan`` over mel frames: the forward DP
``Q[i, j] = value[i, j] + max(Q[i-1, j-1], Q[i, j-1])`` is vectorized over the
text axis and the batch (one shifted ``jnp.maximum`` per scan step), and the
backtrace is a reverse scan carrying the current text index. The whole batch
aligns in one jit call — no host round trip per utterance.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

__all__ = ["maximum_path"]

_NEG = -1e9


def maximum_path(
    value: jnp.ndarray,
    text_lengths: tp.Optional[jnp.ndarray] = None,
    mel_lengths: tp.Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Best monotonic path through a log-likelihood grid.

    Args:
      value: (B, T_text, T_mel) log-likelihoods.
      text_lengths: (B,) valid text lengths (default: full).
      mel_lengths: (B,) valid mel lengths (default: full).

    Returns:
      (B, T_text, T_mel) one-hot alignment: exactly one active text index per
      valid mel frame, non-decreasing, starting at (0, 0) and ending at
      (text_len-1, mel_len-1). Padding region is all zeros.
    """
    b, tx, ty = value.shape
    if text_lengths is None:
        text_lengths = jnp.full((b,), tx, dtype=jnp.int32)
    if mel_lengths is None:
        mel_lengths = jnp.full((b,), ty, dtype=jnp.int32)

    text_idx = jnp.arange(tx)
    text_valid = text_idx[None, :] < text_lengths[:, None]  # (B, Tx)
    value = jnp.where(text_valid[:, :, None], value, _NEG)

    # ---- forward DP: scan over mel frames -------------------------------
    def fwd_step(q_prev, v_j):
        # q_prev: (B, Tx) best score ending at text i, frame j-1
        shifted = jnp.concatenate([jnp.full_like(q_prev[:, :1], _NEG), q_prev[:, :-1]], axis=1)
        q = v_j + jnp.maximum(q_prev, shifted)
        return q, q

    v0 = value[:, :, 0]
    q0 = jnp.where(text_idx[None, :] == 0, v0, _NEG)
    _, q_all = jax.lax.scan(fwd_step, q0, jnp.moveaxis(value[:, :, 1:], 2, 0))
    q_all = jnp.concatenate([q0[None], q_all], axis=0)  # (Ty, B, Tx)

    # ---- backtrace: reverse scan carrying current text index ------------
    batch = jnp.arange(b)
    i_end = text_lengths - 1

    def bwd_step(i_cur, j):
        active = j < mel_lengths  # (B,)
        is_last = j == mel_lengths - 1
        i_here = jnp.where(is_last, i_end, i_cur)
        row = jax.nn.one_hot(i_here, tx, dtype=value.dtype) * active[:, None].astype(value.dtype)
        # decide the index for frame j-1
        q_prev = q_all[jnp.maximum(j - 1, 0)]  # (B, Tx); j=0 unused
        stay = q_prev[batch, i_here]
        diag = q_prev[batch, jnp.maximum(i_here - 1, 0)]
        move_up = (diag > stay) & (i_here > 0)
        i_next = jnp.where(active & (j > 0), jnp.where(move_up, i_here - 1, i_here), i_here)
        return i_next, row

    js = jnp.arange(ty - 1, -1, -1)
    _, rows = jax.lax.scan(bwd_step, i_end, js)
    rows = rows[::-1]  # (Ty, B, Tx)
    path = jnp.moveaxis(rows, 0, 2)  # (B, Tx, Ty)
    return path
