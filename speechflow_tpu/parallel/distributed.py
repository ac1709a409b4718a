"""Multi-host (multi-process) data-parallel training support.

The reference runs real multi-GPU DDP: N ranks, rank0 hosting the DataServer,
its address broadcast to the other ranks through torch.distributed, and
per-loader samplers on the server (speechflow/data_server/helpers.py:154-188,
server.py:229-269). The TPU-native equivalent built here:

- ``init_distributed`` wraps ``jax.distributed.initialize`` with env-driven
  configuration (coordinator address, process count/id), so the same train
  CLI runs single-process or as one rank of a multi-host job.
- after initialization ``jax.devices()`` is the *global* device list, so the
  existing ``make_mesh``/``NamedSharding`` code paths span hosts unchanged;
  XLA inserts the gradient all-reduce over ICI/DCN.
- each process feeds only its addressable shard: ``global_batch`` assembles a
  process-local numpy batch into global jax.Arrays with
  ``jax.make_array_from_process_local_data`` (the batch axis is the mesh
  'data' axis, sharded across processes).
- ``broadcast_bytes`` replaces the reference's string-tensor broadcast hack:
  rank0 publishes the DataServer address to all ranks through a device
  all-gather of uint8 payloads (jax.experimental.multihost_utils).

Env contract (set by the job launcher, one process per host):

    SPEECHFLOW_COORDINATOR   host:port of rank0 (jax.distributed coordinator)
    SPEECHFLOW_NUM_PROCESSES total process count
    SPEECHFLOW_PROCESS_ID    this process's rank

On Cloud TPU pods these are auto-detected by jax.distributed and none are
needed; the env vars exist for CPU testing and bare-metal launches.
"""

from __future__ import annotations

import logging
import os
import typing as tp

import numpy as np

LOGGER = logging.getLogger("speechflow_tpu")

__all__ = [
    "init_distributed",
    "is_distributed",
    "process_index",
    "process_count",
    "global_batch",
    "broadcast_bytes",
]

_INITIALIZED = False


def init_distributed(
    coordinator: tp.Optional[str] = None,
    num_processes: tp.Optional[int] = None,
    process_id: tp.Optional[int] = None,
) -> tp.Tuple[int, int]:
    """Initialize jax.distributed from args or env; return (rank, world_size).

    A no-op (returning (0, 1)-style local values) when neither args nor the
    SPEECHFLOW_* env vars are set and no cluster is auto-detectable — the
    single-process path stays exactly as before.
    """
    global _INITIALIZED
    import jax

    coordinator = coordinator or os.environ.get("SPEECHFLOW_COORDINATOR")
    if num_processes is None and "SPEECHFLOW_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["SPEECHFLOW_NUM_PROCESSES"])
    if process_id is None and "SPEECHFLOW_PROCESS_ID" in os.environ:
        process_id = int(os.environ["SPEECHFLOW_PROCESS_ID"])

    if not _INITIALIZED and coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        _INITIALIZED = True
        LOGGER.info(
            "jax.distributed initialized: rank %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), jax.device_count())
    return jax.process_index(), jax.process_count()


def is_distributed() -> bool:
    import jax

    return jax.process_count() > 1


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def global_batch(tree: tp.Any, mesh, axis: str = "data") -> tp.Any:
    """Assemble a process-local batch into global arrays over ``mesh``.

    Each leaf's leading dim is this process's shard of the global batch axis;
    ``jax.make_array_from_process_local_data`` stitches the per-process
    shards into one global jax.Array sharded over the mesh ``axis``
    (the reference equivalent is DDP's implicit per-rank batch split).
    Scalars and non-arrays are replicated/passed through.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def put(x):
        if hasattr(x, "ndim") and getattr(x, "ndim", 0) >= 1:
            spec = P(axis, *([None] * (x.ndim - 1)))
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), np.asarray(x))
        if hasattr(x, "ndim"):  # 0-d scalar: same value on every process
            return jax.device_put(x, repl)
        return x

    return jax.tree_util.tree_map(put, tree)


def broadcast_bytes(payload: tp.Optional[bytes], max_len: int = 1024) -> bytes:
    """Broadcast a byte string from rank0 to every process.

    Parity with the reference's DataServer address broadcast
    (helpers.py:178-188: torch.distributed.broadcast of an encoded string
    tensor) — here via multihost_utils over the global device mesh.
    Non-root ranks pass payload=None.
    """
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        assert payload is not None
        return payload
    buf = np.zeros(max_len + 4, np.uint8)
    if jax.process_index() == 0:
        assert payload is not None and len(payload) <= max_len
        buf[:4] = np.frombuffer(np.uint32(len(payload)).tobytes(), np.uint8)
        buf[4:4 + len(payload)] = np.frombuffer(payload, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    out = np.asarray(out)
    n = int(np.frombuffer(out[:4].tobytes(), np.uint32)[0])
    return out[4:4 + n].tobytes()
