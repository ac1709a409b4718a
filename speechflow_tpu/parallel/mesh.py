"""Device mesh & sharding helpers — the TPU-native replacement for DDP/NCCL.

The reference scales with Lightning DDP over NCCL (SURVEY §2.5); here data
parallelism is jit + NamedSharding over an ICI mesh: batches are sharded on
the ``data`` axis, parameters/optimizer state are replicated (or sharded on
``model`` for tensor parallelism), and XLA inserts the gradient psum.
"""

from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate_state", "data_sharding"]


def make_mesh(
    n_devices: tp.Optional[int] = None,
    shape: tp.Optional[tp.Dict[str, int]] = None,
    devices: tp.Optional[tp.Sequence[jax.Device]] = None,
) -> Mesh:
    """1D data mesh by default; pass shape={'data': 4, 'model': 2} for 2D."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = {"data": len(devices)}
    names = tuple(shape.keys())
    dims = tuple(shape.values())
    arr = np.asarray(devices).reshape(dims)
    return Mesh(arr, names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: tp.Any, mesh: Mesh, axis: str = "data") -> tp.Any:
    """Place every array leaf with its leading dim sharded over ``axis``.

    Non-array leaves pass through; scalars are replicated. Under
    jax.distributed (process_count > 1) each process holds only its local
    slice of the batch; the leaves are then stitched into global arrays with
    ``make_array_from_process_local_data`` (parallel/distributed.py).
    """
    if jax.process_count() > 1:
        from speechflow_tpu.parallel.distributed import global_batch

        return global_batch(batch, mesh, axis=axis)

    def put(x):
        if hasattr(x, "ndim") and getattr(x, "ndim", 0) >= 1:
            spec = P(axis, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        if hasattr(x, "ndim"):
            return jax.device_put(x, NamedSharding(mesh, P()))
        return x

    return jax.tree_util.tree_map(put, batch)


def replicate_state(state: tp.Any, mesh: Mesh) -> tp.Any:
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    repl = NamedSharding(mesh, P())

    def put(x):
        return jax.device_put(x, repl) if hasattr(x, "ndim") else x

    return jax.tree_util.tree_map(put, state)
