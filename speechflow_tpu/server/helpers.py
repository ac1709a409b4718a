"""Data-plane wiring helpers.

Capability parity with the reference helpers
(speechflow/data_server/helpers.py:56,141,218,341): ``init_data_loader`` spins
up a DataServer process + worker pool + per-subset DataLoaders from a built
pipeline (or config path) and returns a bundle handling shutdown;
``get_dataset_iterator`` provides serverless in-process iteration.

Multi-host: ``init_data_loader_distributed`` is the DDP-parity path
(reference helpers.py:154-188 — rank0 hosts the DataServer, address broadcast
via torch.distributed): under an initialized jax.distributed job, rank0 hosts
the server + workers and broadcasts its tcp address to the other ranks via
``parallel.distributed.broadcast_bytes``; every rank attaches its own
DataLoaders pulling its *local* share of the global batch. A preset
``DATASERVER_ADDR`` env var short-circuits the broadcast (externally hosted
server).
"""

from __future__ import annotations

import os
import pickle
import socket
import typing as tp
from pathlib import Path

from speechflow_tpu.data.core.components import DataPipeline
from speechflow_tpu.server.loader import DataLoader
from speechflow_tpu.server.server import DataServer
from speechflow_tpu.server.worker import WorkerPool

__all__ = ["init_data_loader", "init_data_loader_from_configs",
           "init_data_loader_distributed", "get_dataset_iterator",
           "LoaderBundle", "find_free_port"]


def find_free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def local_ipc_addr(tag: str) -> str:
    """A unique ipc:// (unix-domain-socket) address for same-host wiring.

    The single-host data plane moves ~10 MB batches broker->loader and
    sample lists server->worker; unix sockets skip the TCP/IP stack (no
    checksumming, no small-MTU segmentation) — measured ~1.5-2x on large
    messages vs tcp://127.0.0.1. Multi-host paths still use tcp.
    """
    import tempfile
    import uuid as _uuid

    return f"ipc://{tempfile.gettempdir()}/sftpu-{tag}-{_uuid.uuid4().hex[:12]}.sock"


class LoaderBundle:
    def __init__(self, server: tp.Optional[DataServer], pool: tp.Optional[WorkerPool],
                 loaders: tp.Dict[str, DataLoader]):
        self.server = server  # None on non-root ranks of a distributed job
        self.pool = pool
        self.loaders = loaders

    def __getitem__(self, subset: str) -> DataLoader:
        return self.loaders[subset]

    def shutdown(self) -> None:
        for ld in self.loaders.values():
            ld.stop()
        if self.pool is not None:
            self.pool.stop()
        if self.server is not None:
            self.server.stop()
        self._unlink_ipc()

    def _unlink_ipc(self) -> None:
        """ZMQ leaves unix-socket files behind after close; remove ours."""
        for addr in getattr(self, "_ipc_addrs", ()):  # set by the init helpers
            if addr.startswith("ipc://"):
                try:
                    os.unlink(addr[len("ipc://"):])
                except OSError:
                    pass

    def __enter__(self) -> "LoaderBundle":
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()


def init_data_loader(
    pipeline: tp.Optional[DataPipeline] = None,
    config_path: tp.Optional[tp.Union[str, Path]] = None,
    value_select: tp.Optional[tp.Sequence[str]] = None,
    subsets: tp.Optional[tp.Sequence[str]] = None,
    batch_size: int = 8,
    n_workers: int = 2,
    prefetch_factor: int = 8,
    drop_non_full: bool = False,
    min_batch_size: int = 1,
    synchronize_loaders: bool = False,
    server_addr: tp.Optional[str] = None,
) -> LoaderBundle:
    """Start server + workers + loaders. Pass either a built pipeline or a config path."""
    if pipeline is None:
        assert config_path is not None
        pipeline = DataPipeline.init_from_config(config_path, value_select=value_select)
        pipeline.init_components()
    elif not pipeline._initialized:
        pipeline.init_components()

    subsets = list(subsets or pipeline.subsets)
    front = server_addr or local_ipc_addr("front")
    back = local_ipc_addr("back")

    # ship info + datasets so the server child rebuilds without re-parsing
    payload = pickle.dumps({
        "info": pipeline.get_info(),
        "datasets": {s: pipeline[s].dataset for s in pipeline.subsets},
    }, protocol=5)

    server = DataServer(front, back, payload, n_workers_hint=n_workers,
                        synchronize_loaders=synchronize_loaders)
    server.start(timeout=300)
    pool = WorkerPool(back, n_workers)
    pool.start(timeout=300)
    loaders = {}
    try:
        for s in subsets:
            loaders[s] = DataLoader(
                front, s, batch_size, prefetch_factor=prefetch_factor,
                drop_non_full=drop_non_full, min_batch_size=min_batch_size,
            ).start()
    except Exception:
        for ld in loaders.values():
            ld.stop()
        pool.stop()
        server.stop()
        raise
    bundle = LoaderBundle(server, pool, loaders)
    bundle._ipc_addrs = (front, back)
    return bundle


def init_data_loader_distributed(
    pipeline: tp.Optional[DataPipeline] = None,
    config_path: tp.Optional[tp.Union[str, Path]] = None,
    value_select: tp.Optional[tp.Sequence[str]] = None,
    subsets: tp.Optional[tp.Sequence[str]] = None,
    batch_size: int = 8,
    n_workers: int = 2,
    prefetch_factor: int = 8,
    drop_non_full: bool = False,
    min_batch_size: int = 1,
    host: tp.Optional[str] = None,
) -> LoaderBundle:
    """Multi-host data plane: rank0 hosts, every rank attaches loaders.

    ``batch_size`` is the *per-process* batch size (global batch =
    batch_size x jax.process_count()); the server's shared sampler hands
    disjoint sample lists to each rank's loader, the multi-host analogue of
    DDP's per-rank batch split (reference helpers.py:154-188). Call after
    ``parallel.distributed.init_distributed``. ``host`` is the interface
    rank0 binds (default: this host's primary address; loaders on other
    hosts reach it over TCP).
    """
    import jax

    from speechflow_tpu.parallel.distributed import broadcast_bytes

    if jax.process_count() == 1:
        return init_data_loader(
            pipeline=pipeline, config_path=config_path, value_select=value_select,
            subsets=subsets, batch_size=batch_size, n_workers=n_workers,
            prefetch_factor=prefetch_factor, drop_non_full=drop_non_full,
            min_batch_size=min_batch_size)

    preset = os.environ.get("DATASERVER_ADDR")
    server: tp.Optional[DataServer] = None
    pool: tp.Optional[WorkerPool] = None

    if preset:
        front = preset if jax.process_index() == 0 else None
        front = broadcast_bytes(front.encode() if front else None).decode()
    elif jax.process_index() == 0:
        if pipeline is None:
            assert config_path is not None, "rank0 needs a pipeline or config"
            pipeline = DataPipeline.init_from_config(config_path, value_select=value_select)
            pipeline.init_components()
        elif not pipeline._initialized:
            pipeline.init_components()
        if host is None:
            host = os.environ.get("SPEECHFLOW_DATASERVER_HOST")
        if host is None:
            try:  # routable address of this host; lo-only sandboxes fall back
                host = socket.gethostbyname(socket.gethostname())
            except OSError:
                host = "127.0.0.1"
        front = f"tcp://{host}:{find_free_port()}"
        back = f"tcp://{host}:{find_free_port()}"
        payload = pickle.dumps({
            "info": pipeline.get_info(),
            "datasets": {s: pipeline[s].dataset for s in pipeline.subsets},
        }, protocol=5)
        server = DataServer(front, back, payload, n_workers_hint=n_workers)
        server.start(timeout=300)
        pool = WorkerPool(back, n_workers)
        pool.start(timeout=300)
        front = broadcast_bytes(front.encode()).decode()
    else:
        front = broadcast_bytes(None).decode()

    if subsets is None:
        if pipeline is not None:
            subsets = list(pipeline.subsets)
        else:
            from speechflow_tpu.server.client import DataClient

            with DataClient(front) as client:
                subsets = list(client.info["subsets"])

    loaders: tp.Dict[str, DataLoader] = {}
    try:
        for s in subsets:
            loaders[s] = DataLoader(
                front, s, batch_size, prefetch_factor=prefetch_factor,
                drop_non_full=drop_non_full, min_batch_size=min_batch_size,
            ).start()
    except Exception:
        for ld in loaders.values():
            ld.stop()
        if pool is not None:
            pool.stop()
        if server is not None:
            server.stop()
        raise
    return LoaderBundle(server, pool, loaders)


def init_data_loader_from_configs(
    config_paths: tp.Sequence[tp.Union[str, Path]],
    value_select: tp.Optional[tp.Sequence[str]] = None,
    subsets: tp.Optional[tp.Sequence[str]] = None,
    batch_size: int = 8,
    n_workers_per_server: int = 2,
    prefetch_factor: int = 8,
) -> "LoaderBundle":
    """Multi-corpus training: one DataServer (+workers) per data config, a
    Proxy fanning them in, loaders speaking to the proxy
    (reference: helpers.py:218 init_data_loader_from_config multi-config path).
    """
    from speechflow_tpu.server.proxy import Proxy

    if len(config_paths) == 1:
        return init_data_loader(config_path=config_paths[0], value_select=value_select,
                                subsets=subsets, batch_size=batch_size,
                                n_workers=n_workers_per_server,
                                prefetch_factor=prefetch_factor)

    servers, pools, fronts, backs = [], [], [], []
    try:
        pipelines = []
        for path in config_paths:
            dp = DataPipeline.init_from_config(path, value_select=value_select)
            dp.init_components()
            pipelines.append(dp)
        # fit is per-corpus; merge the dataset-level state (speaker/lang id
        # maps, ranges, phoneme stats -> alphabet) and push it back into every
        # pipeline so each server labels batches in the merged id space that
        # the Proxy's aggregate info reports to the trainer
        merged = DataPipeline.aggregate_info([dp.get_info() for dp in pipelines])
        for dp in pipelines:
            dp.adopt_shared_state(merged)
        for dp in pipelines:
            front = local_ipc_addr("front")
            back = local_ipc_addr("back")
            payload = pickle.dumps({
                "info": dp.get_info(),
                "datasets": {s: dp[s].dataset for s in dp.subsets},
            }, protocol=5)
            srv = DataServer(front, back, payload, n_workers_hint=n_workers_per_server)
            srv.start(timeout=300)
            pool = WorkerPool(back, n_workers_per_server)
            pool.start(timeout=300)
            servers.append(srv)
            pools.append(pool)
            fronts.append(front)
            backs.append(back)
        proxy_front = local_ipc_addr("proxy")
        proxy = Proxy(proxy_front, fronts)
        proxy.start(timeout=300)
        subsets = list(subsets or pipelines[0].subsets)
        loaders = {
            s: DataLoader(proxy_front, s, batch_size,
                          prefetch_factor=prefetch_factor).start()
            for s in subsets
        }
    except Exception:
        for p in pools:
            p.stop()
        for s in servers:
            s.stop()
        raise

    class _MultiBundle(LoaderBundle):
        def shutdown(self) -> None:
            for ld in self.loaders.values():
                ld.stop()
            proxy.stop()
            for p in pools:
                p.stop()
            for s in servers:
                s.stop()
            self._unlink_ipc()

    bundle = _MultiBundle(servers[0], pools[0], loaders)
    bundle._ipc_addrs = (*fronts, *backs, proxy_front)
    return bundle


def get_dataset_iterator(pipeline: DataPipeline, subset: str = "train",
                         batch_size: int = 8):
    """Serverless in-process batch iterator (reference: helpers.py:341)."""
    if not pipeline._initialized:
        pipeline.init_components()
    comp = pipeline[subset]
    while True:
        batch = comp.sample_batch(batch_size)
        if batch is not None:
            yield batch
            if batch.is_last:
                return
