"""Misc utils parity: versioning checks, device info, checkpoint pruning.

Reference counterparts: speechflow/utils/versioning.py, gpu_info.py
(get_freer_gpu -> TPU device info), training/utils/prune_checkpoint.py:14.
"""

from __future__ import annotations

import pickle
import typing as tp
from pathlib import Path

__all__ = ["version_check", "tpu_info", "prune_checkpoint", "find_free_port",
           "enable_compilation_cache"]


def enable_compilation_cache(cache_dir: tp.Optional[str] = None) -> str:
    """Turn on JAX's persistent compilation cache.

    XLA compiles are the dominant cost of the debug-scale train smokes (each
    CLI run re-traces every jitted step); the on-disk cache makes repeat
    compiles ~6x faster.  Directory resolution order: explicit arg,
    ``SPEECHFLOW_JAX_CACHE`` env var, ``~/.cache/speechflow_tpu/jax``.
    Safe to call multiple times; a no-op if the cache is already configured.
    """
    import os

    import jax

    path = (cache_dir or os.environ.get("SPEECHFLOW_JAX_CACHE")
            or os.path.join(os.path.expanduser("~"), ".cache", "speechflow_tpu", "jax"))
    if jax.config.jax_compilation_cache_dir == path:
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # keep XLA's embedded AOT kernel caches out of the entries: reloading
    # them in a fresh process spams machine-feature-mismatch warnings on CPU
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    return path


def version_check(module, minimum: str, name: tp.Optional[str] = None) -> bool:
    """Warn when a dependency is older than the tested minimum."""
    import logging

    have = tuple(int(x) for x in str(getattr(module, "__version__", "0")).split(".")[:3]
                 if x.isdigit())
    want = tuple(int(x) for x in minimum.split(".")[:3])
    ok = have >= want
    if not ok:
        logging.getLogger("speechflow_tpu").warning(
            "%s %s < required %s", name or module.__name__, have, minimum)
    return ok


def tpu_info() -> tp.List[dict]:
    """Device inventory (replaces get_freer_gpu — XLA owns placement on TPU)."""
    import jax

    out = []
    for d in jax.devices():
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        out.append({
            "id": d.id, "platform": d.platform, "kind": getattr(d, "device_kind", "?"),
            "bytes_in_use": stats.get("bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        })
    return out


def prune_checkpoint(ckpt_path: tp.Union[str, Path], out_path: tp.Union[str, Path],
                     drop_optimizer: bool = True,
                     drop_sources: bool = True) -> Path:
    """Shrink a checkpoint for distribution (reference prune_checkpoint.py:14):
    drops optimizer state and the source-code snapshot, keeps model weights,
    configs, alphabet and singleton state."""
    from speechflow_tpu.training.saver import ExperimentSaver
    import orbax.checkpoint as ocp
    import numpy as np

    tree, payload = ExperimentSaver.load_checkpoint(ckpt_path)
    slim_tree = {"model": tree["model"], "step": tree.get("step", np.asarray(0))}
    if not drop_optimizer and "opt" in tree:
        slim_tree["opt"] = tree["opt"]
    if drop_sources:
        payload = {k: v for k, v in payload.items() if k != "sources"}
    out_path = Path(out_path)
    ocp.PyTreeCheckpointer().save(out_path.absolute(), slim_tree)
    (out_path / "payload.pkl").write_bytes(pickle.dumps(payload, protocol=5))
    return out_path


def find_free_port() -> int:
    from speechflow_tpu.server.helpers import find_free_port as _f

    return _f()
