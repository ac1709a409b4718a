"""Test env: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count=8) because only one real TPU chip is
attached in this environment; the shardings themselves are written for a TPU
ICI mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may point at a TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize may have imported jax already (axon TPU plugin); override post-import
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the slow tier's cost is dominated by XLA
# re-compiles of the same debug-shape programs run after run; with the cache
# warm they load from disk instead (VERDICT r2 next-step #7).
from speechflow_tpu.utils.misc import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_MINI_DATASET = "/root/reference/examples/simple_datasets/speech/SEGS"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def mini_dataset_path():
    p = REFERENCE_MINI_DATASET
    if not os.path.isdir(p):
        pytest.skip("reference mini dataset not available")
    return p
