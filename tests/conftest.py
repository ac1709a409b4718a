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

# Shared feature-dump cache for the train-script smokes: each smoke rebuilds
# the same debug pipeline over the same 6 mini-corpus utterances and recomputes
# the expensive handlers (YIN pitch is ~260 ms/sample) every batch of every
# test. The cache directory is salted with a hash of the feature-producing
# sources so any code change invalidates it instead of masking a regression.


def _feature_code_salt() -> str:
    import hashlib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for sub in ("speechflow_tpu/data", "speechflow_tpu/ops", "speechflow_tpu/models"):
        base = os.path.join(root, sub)
        for dirpath, _, files in sorted(os.walk(base)):
            for f in sorted(files):
                if f.endswith(".py"):
                    with open(os.path.join(dirpath, f), "rb") as fh:
                        h.update(fh.read())
    return h.hexdigest()[:16]


def _setup_dump_cache() -> None:
    if "SFTPU_DUMP_CACHE" in os.environ:  # explicit override wins
        return
    import shutil

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".dump_cache")
    salt = _feature_code_salt()
    target = os.path.join(base, salt)
    if os.path.isdir(base):  # drop stale salts from previous code states
        for d in os.listdir(base):
            if d != salt:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    os.makedirs(target, exist_ok=True)
    os.environ["SFTPU_DUMP_CACHE"] = target


_setup_dump_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from tests.paths import MINI_SEGS

REFERENCE_MINI_DATASET = MINI_SEGS  # vendored; see tests/paths.py


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def mini_dataset_path():
    p = REFERENCE_MINI_DATASET
    if not os.path.isdir(p):
        pytest.skip("reference mini dataset not available")
    return p
