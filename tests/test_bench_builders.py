"""The driver runs bench.py on real TPU hardware at the end of every round;
an API drift that breaks a stage builder would silently turn a perf row into
a *_error field. Build every stage group at tiny shapes on CPU and run one
call through each program."""

import importlib

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture()
def tiny_bench(monkeypatch):
    import bench as B

    importlib.reload(B)
    monkeypatch.setattr(B, "BATCH", 2)
    monkeypatch.setattr(B, "T_FRAMES", 64)
    monkeypatch.setattr(B, "N_TOKENS", 8)
    monkeypatch.setattr(B, "CFM_STEPS", 2)
    monkeypatch.setattr(B, "GAN_BATCH", 2)
    monkeypatch.setattr(B, "GAN_CHUNK", 2048)
    monkeypatch.setattr(B, "XTTS_BATCH", 1)
    monkeypatch.setattr(B, "XTTS_TOKENS", 4)
    return B


def _run_all(stages):
    import jax

    for name, (fn, args) in stages.items():
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            assert np.isfinite(np.asarray(leaf)).all(), name


def test_toy_group_builds_and_runs(tiny_bench):
    fn, args, stages, _ = tiny_bench.build_toy()
    import jax

    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
    _run_all(stages)


def test_dsp_and_xtts_groups_build_and_run(tiny_bench):
    _run_all(tiny_bench.build_dsp_stages())
    stages, audio_s = tiny_bench.build_xtts_stage(value_select="debug")
    assert audio_s > 0
    _run_all(stages)


def test_flagship_group_builds_and_runs(tiny_bench):
    stages, _ = tiny_bench.build_flagship_stages(value_select="debug")
    _run_all(stages)


def test_gan_step_builds_and_runs(tiny_bench):
    gan, batch = tiny_bench.build_gan_step()
    logs = gan.training_step(batch)
    assert "disc/total" in logs  # the bench's complete-barrier key
    assert np.isfinite(float(logs["disc/total"]))
