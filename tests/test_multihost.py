"""Multi-host (multi-process) data-parallel training tests.

The reference's DDP capability (rank0-hosted DataServer + address broadcast +
per-rank loaders, speechflow/data_server/helpers.py:154-188, server.py:229-269)
rebuilt TPU-native: jax.distributed over localhost CPU processes, each with 4
virtual devices, global batches assembled via
jax.make_array_from_process_local_data. Acceptance (VERDICT r2 #1): the
2-process training step produces the same losses as the single-process
8-device run, and each rank's loader receives a disjoint share of the data.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORKER = Path(__file__).parent / "tools" / "multihost_worker.py"
REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(rank: int, world: int, port: int, mode: str, out: Path,
            local_devices: int) -> subprocess.Popen:
    env = os.environ.copy()
    env.pop("XLA_FLAGS", None)  # the worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, str(WORKER), "--rank", str(rank), "--world", str(world),
         "--port", str(port), "--mode", mode, "--out", str(out),
         "--local-devices", str(local_devices)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def _run_world(world: int, mode: str, tmp: Path, local_devices: int) -> list:
    port = _free_port()
    outs = [tmp / f"{mode}_w{world}_r{r}.json" for r in range(world)]
    procs = [_launch(r, world, port, mode, outs[r], local_devices)
             for r in range(world)]
    logs = [p.communicate(timeout=600)[0].decode(errors="replace") for p in procs]
    for r, p in enumerate(procs):
        assert p.returncode == 0, f"rank {r} failed:\n{logs[r][-4000:]}"
    return [json.loads(o.read_text()) for o in outs]


def test_two_process_trainstep_matches_single_process(tmp_path):
    """Same global batch, same seed: 2 ranks x 4 devices must reproduce the
    1 process x 8 devices training losses exactly."""
    single = _run_world(1, "trainstep", tmp_path, local_devices=8)[0]
    double = _run_world(2, "trainstep", tmp_path, local_devices=4)

    ref = np.asarray(single["losses"])
    assert np.isfinite(ref).all() and len(ref) == 3
    # losses decrease: the optimizer is really stepping
    assert ref[-1] < ref[0]
    for r in double:
        got = np.asarray(r["losses"])
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # both ranks observed the identical (replicated) loss
    np.testing.assert_allclose(double[0]["losses"], double[1]["losses"])


def test_distributed_dataplane_rank_disjoint(tmp_path):
    """rank0 hosts the DataServer; the address reaches rank1 via the
    collective broadcast; the shared sampler hands each rank disjoint
    samples (the DDP per-rank batch split)."""
    results = _run_world(2, "dataplane", tmp_path, local_devices=1)
    seen = [set(r["labels"]) for r in results]
    assert all(len(s) == 8 for s in seen)  # 2 batches x 4 samples, no repeats
    assert not (seen[0] & seen[1]), "ranks received overlapping samples"
