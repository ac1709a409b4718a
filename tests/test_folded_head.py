"""Exactness of the folded (space-to-depth) BigVGAN-head inference path.

FoldedSnakeHead rebuilds a trained SnakeUpsampleHead into a layout-optimized
inference equivalent (ops/folded.py): once channels drop below a threshold,
activations stay folded as (B, T/F, F*C) and every conv / ConvTranspose /
anti-aliased snake runs on exactly scattered folded kernels.  These tests pin
that the transform is numerically exact (float reassociation only) across
mixed folded/unfolded stages, batch sizes, and frame counts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from speechflow_tpu.models.vocoder.folded_head import FoldedSnakeHead
from speechflow_tpu.models.vocoder.heads import SnakeUpsampleHead
from speechflow_tpu.ops import folded as fd


@pytest.fixture(scope="module")
def head():
    return SnakeUpsampleHead(dim=12, upsample_rates=(2, 2, 2), channels=32,
                             resblock_kernel_sizes=(3, 7), taps=8,
                             remat=False, rngs=nnx.Rngs(0))


def _err(a, b):
    return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))


def test_fold_is_reshape_roundtrip():
    x = jnp.arange(2 * 24 * 6, dtype=jnp.float32).reshape(2, 24, 6)
    for F in (1, 2, 3, 4):
        assert np.array_equal(fd.unfold(fd.fold(x, F), 6), x)


@pytest.mark.parametrize("batch,frames", [(2, 32), (1, 24), (3, 40)])
def test_folded_head_matches_true_head(head, batch, frames):
    rng = np.random.default_rng(frames)
    x = jnp.asarray(rng.normal(size=(batch, frames, 12)), jnp.float32)
    true = head(x)
    folded = FoldedSnakeHead(head, target=48, threshold=64)  # folds all stages
    got = folded(x)
    assert got.shape == true.shape == (batch, frames * 8)
    assert _err(got, true) < 1e-4, _err(got, true)


def test_folded_head_mixed_stages(head):
    """threshold leaves the first stage (C=16) unfolded — the fold entry
    point mid-stack must still be exact."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 12)), jnp.float32)
    true = head(x)
    folded = FoldedSnakeHead(head, target=48, threshold=16)
    assert folded.geom[0][2] == 1 and folded.geom[1][2] > 1
    got = folded(x)
    assert _err(got, true) < 1e-4


def test_folded_head_jits_via_split_merge(head):
    """The folded head is an nnx.Module: it must survive split/merge + jit
    (the bench/interface integration path)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 12)), jnp.float32)
    folded = FoldedSnakeHead(head, target=48, threshold=64)
    gdef, state = nnx.split(folded)

    @jax.jit
    def run(state, x):
        return nnx.merge(gdef, state)(x)

    assert _err(run(state, x), head(x)) < 1e-4


def test_vocos_fold_inference_swaps_head():
    from speechflow_tpu.models.vocoder import Vocos, VocosParams

    params = VocosParams.create(dict(
        feature_extractor="audio", input_feature="mel", n_mels=8, dim=12,
        n_layers=1, head="snake_upsample", upsample_rates=(2, 2),
        upsample_channels=16, resblock_kernel_sizes=(3,), sample_rate=24000,
        hop_length=4, snake_taps=8))
    model = Vocos(params, rngs=nnx.Rngs(0))
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.normal(size=(1, 16, 8)), jnp.float32)
    true = model.from_features(mel)
    assert model.fold_inference(target=32, threshold=32)
    assert isinstance(model.head, FoldedSnakeHead)
    got = model.from_features(mel)
    assert got.shape == true.shape
    assert _err(got, true) < 1e-4
    assert not model.fold_inference()  # idempotent no-op on a folded head
