"""Pallas kernel parity tests (interpret mode on CPU; compiled path exercised
on real TPU in bench/verify runs)."""

import jax.numpy as jnp
import numpy as np

from speechflow_tpu.ops.anti_alias import (
    anti_alias_snake,
    anti_alias_snake_pallas,
    anti_alias_snake_xla,
)


def test_pallas_anti_alias_matches_xla(rng):
    x = jnp.asarray(rng.normal(size=(2, 200, 96)).astype(np.float32))
    alpha = jnp.asarray(rng.normal(size=96).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.normal(size=96).astype(np.float32) * 0.1)
    ref = np.asarray(anti_alias_snake_xla(x, alpha, beta))
    pal = np.asarray(anti_alias_snake_pallas(x, alpha, beta, interpret=True))
    assert ref.shape == pal.shape
    assert np.abs(ref - pal).max() < 1e-5


def test_pallas_anti_alias_tiling_edges(rng):
    # time length not a multiple of the tile; several tiles
    x = jnp.asarray(rng.normal(size=(1, 700, 64)).astype(np.float32))
    alpha = jnp.asarray(np.zeros(64, np.float32))
    beta = jnp.asarray(np.zeros(64, np.float32))
    ref = np.asarray(anti_alias_snake_xla(x, alpha, beta))
    pal = np.asarray(anti_alias_snake_pallas(x, alpha, beta, tile_t=256, interpret=True))
    assert np.abs(ref - pal).max() < 1e-5


def test_anti_alias_grad(rng):
    import jax

    x = jnp.asarray(rng.normal(size=(1, 64, 32)).astype(np.float32))
    alpha = jnp.zeros((32,))
    beta = jnp.zeros((32,))
    g = jax.grad(lambda v, a, b: jnp.sum(anti_alias_snake(v, a, b) ** 2),
                 argnums=(0, 1, 2))(x, alpha, beta)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
