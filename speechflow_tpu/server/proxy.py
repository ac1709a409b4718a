"""Proxy: fan-in over multiple DataServers.

Capability parity with the reference Proxy (speechflow/data_server/proxy.py:19):
a front ROUTER speaking the loader protocol, backed by DEALER connections to N
DataServers; ``info`` aggregates the servers' pipeline infos
(DataPipeline.aggregate_info merges singleton states), ``get_batch`` round-
robins across backends, and batches stream back to the requesting loader.
Subclasses may override ``batch_preprocessing`` to transform batches in
flight. Multi-dataset training (one server per corpus) hangs off this.
"""

from __future__ import annotations

import itertools
import logging
import pickle
import typing as tp

import zmq

from speechflow_tpu.concurrency.process_worker import ProcessWorker
from speechflow_tpu.data.core.components import DataPipeline
from speechflow_tpu.io import Serialize

LOGGER = logging.getLogger("speechflow_tpu")

__all__ = ["Proxy"]


class Proxy(ProcessWorker):
    def __init__(self, frontend_addr: str, backend_addrs: tp.Sequence[str]):
        super().__init__(none_stop=True, name="DataProxy")
        self.frontend_addr = frontend_addr
        self.backend_addrs = list(backend_addrs)

    def on_start(self) -> None:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        ctx = zmq.Context.instance()
        self.frontend = ctx.socket(zmq.ROUTER)
        self.frontend.bind(self.frontend_addr)
        self.backends = []
        for addr in self.backend_addrs:
            s = ctx.socket(zmq.DEALER)
            s.setsockopt(zmq.LINGER, 500)
            s.connect(addr)
            self.backends.append(s)
        self.poller = zmq.Poller()
        self.poller.register(self.frontend, zmq.POLLIN)
        for s in self.backends:
            self.poller.register(s, zmq.POLLIN)
        self._rr = itertools.cycle(range(len(self.backends)))
        # (uid, subset, req) -> loader ident: replies carry uid+req, so routing
        # is exact even with out-of-order backends
        self._route: tp.Dict[tp.Tuple[str, str, int], bytes] = {}
        self._info_blob: tp.Optional[bytes] = None

    def batch_preprocessing(self, batch_blob: bytes) -> bytes:
        """Override point (reference subclass hook)."""
        return batch_blob

    def _aggregate_info(self) -> bytes:
        infos = []
        for s in self.backends:
            s.send(pickle.dumps({"type": "info"}))
        for s in self.backends:
            if s.poll(30_000):
                reply = pickle.loads(s.recv())
                infos.append(Serialize.load(reply["blob"]))
        merged = DataPipeline.aggregate_info(infos)
        return Serialize.dump(merged)

    def do_work_once(self) -> None:
        events = dict(self.poller.poll(100))
        if self.frontend in events:
            frames = self.frontend.recv_multipart()
            ident, msg = frames[0], pickle.loads(frames[-1])
            if msg.get("type") == "info":
                if self._info_blob is None:
                    self._info_blob = self._aggregate_info()
                self.frontend.send_multipart([ident, pickle.dumps(
                    {"type": "info", "blob": self._info_blob,
                     "n_workers": len(self.backends)})])
            elif msg.get("type") == "get_batch":
                key = (msg.get("uid", ""), msg.get("subset", ""), msg.get("req", -1))
                self._route[key] = ident
                self.backends[next(self._rr)].send(pickle.dumps(msg))
        for s in self.backends:
            if s in events:
                frames = s.recv_multipart()
                msg = pickle.loads(frames[0])
                payload = frames[1:]
                if msg.get("type") in ("batch", "batch_failed", "reject"):
                    key = (msg.get("uid", ""), msg.get("subset", ""), msg.get("req", -1))
                    ident = self._route.get(key)
                    if ident is None:
                        continue
                    if msg["type"] != "reject":
                        self._route.pop(key, None)
                    if (msg["type"] == "batch" and type(self).batch_preprocessing
                            is not Proxy.batch_preprocessing):
                        # subclass hook: materialize the batch blob, transform,
                        # re-frame (the zero-copy fast path skips all of this)
                        blob = self.batch_preprocessing(
                            Serialize.dump(Serialize.load_frames(payload))
                            if payload else msg["batch_blob"])
                        payload = [blob]
                    self.frontend.send_multipart(
                        [ident, frames[0], *payload], copy=False)

    def on_finish(self) -> None:
        self.frontend.close(0)
        for s in self.backends:
            s.close(0)
