"""Deterministic seeding across python/numpy/jax (reference: speechflow/utils/seed.py)."""

from __future__ import annotations

import random

import numpy as np

__all__ = ["set_seed", "jax_key"]


def set_seed(seed: int = 0) -> None:
    random.seed(seed)
    np.random.seed(seed)


def jax_key(seed: int = 0):
    import jax

    return jax.random.PRNGKey(seed)
