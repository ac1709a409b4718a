"""Data-plane wiring helpers.

Capability parity with the reference helpers
(speechflow/data_server/helpers.py:56,141,218,341): ``init_data_loader`` spins
up a DataServer process + worker pool + per-subset DataLoaders from a built
pipeline (or config path) and returns a bundle handling shutdown;
``get_dataset_iterator`` provides serverless in-process iteration. The
reference's DDP address-broadcast hack (torch.distributed string tensor) is
replaced by the ``DATASERVER_ADDR`` env var / explicit address passing —
jax.distributed handles host coordination.
"""

from __future__ import annotations

import pickle
import socket
import typing as tp
from pathlib import Path

from speechflow_tpu.data.core.components import DataPipeline
from speechflow_tpu.server.loader import DataLoader
from speechflow_tpu.server.server import DataServer
from speechflow_tpu.server.worker import WorkerPool

__all__ = ["init_data_loader", "init_data_loader_from_configs", "get_dataset_iterator", "LoaderBundle", "find_free_port"]


def find_free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class LoaderBundle:
    def __init__(self, server: DataServer, pool: WorkerPool,
                 loaders: tp.Dict[str, DataLoader]):
        self.server = server
        self.pool = pool
        self.loaders = loaders

    def __getitem__(self, subset: str) -> DataLoader:
        return self.loaders[subset]

    def shutdown(self) -> None:
        for ld in self.loaders.values():
            ld.stop()
        self.pool.stop()
        self.server.stop()

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
    front = server_addr or f"tcp://127.0.0.1:{find_free_port()}"
    back = f"tcp://127.0.0.1:{find_free_port()}"

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

    servers, pools, fronts = [], [], []
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
            front = f"tcp://127.0.0.1:{find_free_port()}"
            back = f"tcp://127.0.0.1:{find_free_port()}"
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
        proxy_front = f"tcp://127.0.0.1:{find_free_port()}"
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

    return _MultiBundle(servers[0], pools[0], loaders)


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
