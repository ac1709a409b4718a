"""Host-side (numpy) padding/stacking utilities for collate functions.

Capability parity with the reference pad utils (speechflow/utils/pad_utils.py):
pad 1D/2D sequences to a common (optionally multiple-of-N) length and stack
into a batch array, returning lengths. Fixed static shapes are the contract
with XLA — collates pad to bucketed maxima so jit never sees dynamic shapes.
"""

from __future__ import annotations

import typing as tp

import numpy as np

__all__ = ["pad_1d", "pad_2d", "stack_and_pad", "round_up"]


def round_up(n: int, multiple: tp.Optional[int]) -> int:
    if not multiple or multiple <= 1:
        return n
    return ((n + multiple - 1) // multiple) * multiple


def pad_1d(x: np.ndarray, target_len: int, pad_value: float = 0.0) -> np.ndarray:
    if len(x) >= target_len:
        return x[:target_len]
    return np.pad(x, (0, target_len - len(x)), constant_values=pad_value)


def pad_2d(x: np.ndarray, target_len: int, pad_value: float = 0.0) -> np.ndarray:
    """Pad along axis 0 of a (T, D) array."""
    if x.shape[0] >= target_len:
        return x[:target_len]
    pad = [(0, target_len - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad, constant_values=pad_value)


def stack_and_pad(
    arrays: tp.Sequence[np.ndarray],
    pad_value: float = 0.0,
    multiple: tp.Optional[int] = None,
    target_len: tp.Optional[int] = None,
) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Stack variable-length arrays into (B, T, ...) + lengths (B,).

    Uses the native C++ packer (utils/native.py) for float32/int32 inputs —
    this is the worker-side per-batch hot loop — with a numpy fallback.
    """
    lengths = np.asarray([a.shape[0] for a in arrays], dtype=np.int32)
    tmax = target_len if target_len is not None else round_up(int(lengths.max()), multiple)

    from speechflow_tpu.utils.native import native_pack

    packed = native_pack(arrays, tmax, pad_value)
    if packed is not None:
        return packed, lengths

    fn = pad_1d if arrays[0].ndim == 1 else pad_2d
    batch = np.stack([fn(a, tmax, pad_value) for a in arrays])
    return batch, lengths
