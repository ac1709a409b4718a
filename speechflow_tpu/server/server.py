"""DataServer: the broker of the distributed data plane.

Capability parity with the reference DataServer
(speechflow/data_server/server.py:47): a ZMQ ROUTER/ROUTER broker process that
(1) serves the pipeline info to subscribers (loaders/workers), (2) runs the
sampler per subset per loader uid, (3) pushes pickled sample lists to batch
workers and routes finished batches back to the requesting loader, with
backpressure (reject when in-flight > ``inflight_factor`` x workers) and an
optional per-loader synchronized sampler mode (DDP loaders see identical
sample streams).

Transport: single-frame pickled dicts over DEALER<->ROUTER (loaders, workers).
"""

from __future__ import annotations

import collections
import logging
import pickle
import typing as tp
import uuid

import zmq

from speechflow_tpu.concurrency.process_worker import ProcessWorker
from speechflow_tpu.data.core.components import DataPipeline
from speechflow_tpu.io import Serialize

LOGGER = logging.getLogger("speechflow_tpu")

__all__ = ["DataServer"]


class DataServer(ProcessWorker):
    def __init__(
        self,
        frontend_addr: str,
        backend_addr: str,
        pipeline_payload: bytes,
        inflight_factor: int = 4,
        n_workers_hint: int = 2,
        synchronize_loaders: bool = False,
    ):
        super().__init__(none_stop=True, name="DataServer")
        self.frontend_addr = frontend_addr
        self.backend_addr = backend_addr
        self.pipeline_payload = pipeline_payload
        self.inflight_factor = inflight_factor
        self.n_workers_hint = n_workers_hint
        self.synchronize_loaders = synchronize_loaders

    # -- child-side state ---------------------------------------------------

    def on_start(self) -> None:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"  # the data plane never touches the TPU
        ctx = zmq.Context.instance()
        self.frontend = ctx.socket(zmq.ROUTER)
        self.frontend.bind(self.frontend_addr)
        self.backend = ctx.socket(zmq.ROUTER)
        self.backend.bind(self.backend_addr)
        self.poller = zmq.Poller()
        self.poller.register(self.frontend, zmq.POLLIN)
        self.poller.register(self.backend, zmq.POLLIN)

        payload = pickle.loads(self.pipeline_payload)
        if "pipeline" in payload:
            self.pipeline: DataPipeline = payload["pipeline"]
            if not self.pipeline._initialized:
                self.pipeline.init_components()
        else:
            dp = DataPipeline.from_info(payload["info"], datasets=payload.get("datasets"))
            self.pipeline = dp
        self.info_blob = Serialize.dump(self.pipeline.get_info())

        self.tasks: collections.deque = collections.deque()
        self.idle_workers: collections.deque = collections.deque()
        self.inflight: tp.Dict[str, dict] = {}
        self.known_workers: tp.Set[bytes] = set()
        self.samplers: tp.Dict[tp.Tuple[str, str], tp.Any] = {}
        self._batches_done = 0
        import time as _time

        self._last_status_ts = _time.time()  # first report after one interval

    def _sampler_for(self, subset: str, loader_uid: str):
        key = (subset, loader_uid if self.synchronize_loaders else "__shared__")
        if key not in self.samplers:
            base = self.pipeline[subset].sampler
            if key[1] == "__shared__":
                self.samplers[key] = base
            else:
                self.samplers[key] = Serialize.load(Serialize.dump(base))
        return self.samplers[key]

    # -- broker loop --------------------------------------------------------------

    def do_work_once(self) -> None:
        events = dict(self.poller.poll(100))
        if self.frontend in events:
            frames = self.frontend.recv_multipart()
            self._on_frontend(frames[0], pickle.loads(frames[-1]))
        if self.backend in events:
            frames = self.backend.recv_multipart()
            self._on_backend(frames[0], pickle.loads(frames[1]), frames[2:])
        self._dispatch()
        self._status_info()

    def _status_info(self, every_s: float = 600.0) -> None:
        """Periodic host/broker status line (reference: server.py:142
        status_info — subscribers, batches prepared, CPU/memory)."""
        import time as _time

        now = _time.time()
        if now - self._last_status_ts < every_s:
            return
        self._last_status_ts = now
        try:
            import psutil

            mem = psutil.virtual_memory()
            LOGGER.info(
                "data server status: workers=%d queued=%d inflight=%d "
                "batches_done=%d cpu=%.0f%% mem_avail=%.0f%%",
                len(self.known_workers), len(self.tasks), len(self.inflight),
                self._batches_done, psutil.cpu_percent(),
                mem.available * 100.0 / mem.total)
        except Exception:  # noqa: BLE001 — status is best-effort
            LOGGER.info("data server status: workers=%d queued=%d inflight=%d "
                        "batches_done=%d",
                        len(self.known_workers), len(self.tasks),
                        len(self.inflight), self._batches_done)

    def _on_frontend(self, ident: bytes, msg: dict) -> None:
        mtype = msg.get("type")
        if mtype == "info":
            self.frontend.send_multipart([ident, pickle.dumps(
                {"type": "info", "blob": self.info_blob,
                 "n_workers": max(len(self.known_workers), self.n_workers_hint)})])
        elif mtype == "get_batch":
            cap = self.inflight_factor * max(len(self.known_workers), self.n_workers_hint)
            if len(self.tasks) + len(self.inflight) >= cap:
                self.frontend.send_multipart([ident, pickle.dumps(
                    {"type": "reject", "req": msg.get("req"),
                     "uid": msg.get("uid", ""), "subset": msg.get("subset", "")})])
                return
            subset = msg["subset"]
            sampler = self._sampler_for(subset, msg.get("uid", ""))
            samples, is_last = sampler.sampling(msg["batch_size"])
            task_id = uuid.uuid4().hex
            task = {
                "type": "task",
                "task_id": task_id,
                "subset": subset,
                "is_last": is_last,
                # samples ride as out-of-band frames next to the header
                "frames": Serialize.dump_frames(list(samples)),
            }
            # req = loader-assigned request id echoed in every reply; the
            # loader reorders by it (workers finish out of order)
            self.inflight[task_id] = {"loader": ident, "subset": subset,
                                      "req": msg.get("req"), "uid": msg.get("uid", "")}
            self.tasks.append(task)
        elif mtype == "abort":
            # drop queued tasks destined for this loader (ident = ZMQ identity)
            dropped = [t for t in self.tasks
                       if self.inflight.get(t["task_id"], {}).get("loader") == ident]
            self.tasks = collections.deque(
                t for t in self.tasks
                if self.inflight.get(t["task_id"], {}).get("loader") != ident
            )
            for t in dropped:
                self.inflight.pop(t["task_id"], None)
        elif mtype == "status":
            self.frontend.send_multipart([ident, pickle.dumps({
                "type": "status",
                "tasks_queued": len(self.tasks),
                "inflight": len(self.inflight),
                "workers": len(self.known_workers),
            })])

    def _on_backend(self, ident: bytes, msg: dict,
                    payload: tp.Sequence[bytes] = ()) -> None:
        mtype = msg.get("type")
        self.known_workers.add(ident)
        if mtype == "ready":
            self.idle_workers.append(ident)
        elif mtype == "info":
            self.backend.send_multipart([ident, pickle.dumps(
                {"type": "info", "blob": self.info_blob})])
        elif mtype == "result":
            meta = self.inflight.pop(msg["task_id"], None)
            self._batches_done += 1
            if meta is not None:
                # the batch payload frames are routed onward verbatim — the
                # broker never deserializes or copies the batch (zero-copy
                # multipart protocol; see Serialize.dump_frames)
                header = pickle.dumps({
                    "type": "batch",
                    "subset": meta["subset"],
                    "req": meta["req"],
                    "uid": meta["uid"],
                })
                self.frontend.send_multipart(
                    [meta["loader"], header, *payload], copy=False)
            # the worker re-announces "ready" itself after each task
        elif mtype == "error":
            meta = self.inflight.pop(msg["task_id"], None)
            LOGGER.warning("worker error on task %s: %s", msg.get("task_id"), msg.get("error"))
            if meta is not None:
                self.frontend.send_multipart([meta["loader"], pickle.dumps({
                    "type": "batch_failed", "subset": meta["subset"],
                    "req": meta["req"], "uid": meta["uid"]})])

    def _dispatch(self) -> None:
        while self.tasks and self.idle_workers:
            task = self.tasks.popleft()
            worker = self.idle_workers.popleft()
            frames = task.pop("frames")
            self.backend.send_multipart(
                [worker, pickle.dumps(task), *frames], copy=False)

    def on_finish(self) -> None:
        self.frontend.close(0)
        self.backend.close(0)
