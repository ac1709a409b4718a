"""Native batch-pack core: parity with the numpy path + speedup sanity."""

import numpy as np
import pytest

from speechflow_tpu.utils.native import native_available, native_pack
from speechflow_tpu.utils.pad import pad_1d, pad_2d, stack_and_pad


def test_native_builds_and_matches_numpy(rng):
    if not native_available():
        pytest.skip("g++/toolchain unavailable")
    # 2D float32
    arrays = [rng.normal(size=(int(t), 8)).astype(np.float32) for t in (5, 12, 3)]
    out = native_pack(arrays, 12)
    ref = np.stack([pad_2d(a, 12) for a in arrays])
    assert np.array_equal(out, ref)
    # 1D float32 with pad value + truncation
    arrays1 = [rng.normal(size=int(t)).astype(np.float32) for t in (20, 4)]
    out1 = native_pack(arrays1, 10, pad_value=-1.0)
    ref1 = np.stack([pad_1d(a, 10, -1.0) for a in arrays1])
    assert np.array_equal(out1, ref1)
    # int32
    ids = [rng.integers(0, 50, size=int(t)).astype(np.int32) for t in (7, 9)]
    outi = native_pack(ids, 9)
    refi = np.stack([pad_1d(a, 9) for a in ids])
    assert np.array_equal(outi, refi)


def test_stack_and_pad_uses_native_transparently(rng):
    arrays = [rng.normal(size=(int(t), 16)).astype(np.float32) for t in (30, 50, 10)]
    batch, lens = stack_and_pad(arrays, multiple=64)
    assert batch.shape == (3, 64, 16)
    assert lens.tolist() == [30, 50, 10]
    assert np.array_equal(batch[2, :10], arrays[2])
    assert (batch[2, 10:] == 0).all()


@pytest.mark.slow
def test_native_speedup(rng):
    if not native_available():
        pytest.skip("toolchain unavailable")
    import time

    arrays = [rng.normal(size=(int(t), 100)).astype(np.float32)
              for t in rng.integers(200, 1000, size=32)]
    tmax = 1024
    t0 = time.perf_counter()
    for _ in range(30):
        native_pack(arrays, tmax)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(30):
        np.stack([pad_2d(a, tmax) for a in arrays])
    t_numpy = time.perf_counter() - t0
    # memcpy path should not be slower than numpy pad+stack
    assert t_native < t_numpy * 1.2, (t_native, t_numpy)
