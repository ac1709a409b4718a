"""BatchWorker / WorkerPool: feature-extraction worker processes.

Capability parity with the reference BatchWorker/WorkerPool
(speechflow/data_server/worker.py:19, pool.py:16): each worker process asks
the server for the pipeline info, rebuilds its own DataPipeline (preproc +
collate, no dataset), then loops: announce ready -> receive a pickled sample
list -> run DataProcessor.process -> send the collated Batch back.
"""

from __future__ import annotations

import logging
import pickle
import typing as tp

import zmq

from speechflow_tpu.concurrency.process_worker import ProcessWorker
from speechflow_tpu.io import Serialize

LOGGER = logging.getLogger("speechflow_tpu")

__all__ = ["BatchWorker", "WorkerPool"]


class BatchWorker(ProcessWorker):
    def __init__(self, backend_addr: str, worker_idx: int = 0):
        super().__init__(none_stop=True, name=f"BatchWorker-{worker_idx}")
        self.backend_addr = backend_addr
        self.worker_idx = worker_idx

    def on_start(self) -> None:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        from speechflow_tpu.data.core.components import DataPipeline

        ctx = zmq.Context.instance()
        self.socket = ctx.socket(zmq.DEALER)
        self.socket.setsockopt(zmq.LINGER, 500)
        self.socket.connect(self.backend_addr)

        # fetch pipeline info and rebuild preproc-only pipeline
        self.socket.send(pickle.dumps({"type": "info"}))
        reply = pickle.loads(self.socket.recv())
        info = Serialize.load(reply["blob"])
        self.pipeline = DataPipeline.from_info(info)
        self._announced = False

    def do_work_once(self) -> None:
        if not self._announced:
            self.socket.send(pickle.dumps({"type": "ready"}))
            self._announced = True
        if not self.socket.poll(200):
            return
        frames = self.socket.recv_multipart()
        msg = pickle.loads(frames[0])
        if msg.get("type") != "task":
            return
        task_id = msg["task_id"]
        # early ready: announce BEFORE processing so the broker streams the
        # next task's sample frames to this worker concurrently with the
        # current collate — one-deep pipelining that overlaps transfer with
        # compute (the reference worker only re-announces after finishing,
        # leaving it idle for the full task round trip)
        self.socket.send(pickle.dumps({"type": "ready"}))
        self._announced = True
        try:
            # samples arrive as out-of-band multipart frames (zero-copy
            # protocol; single-frame blob kept as fallback). writable=True:
            # preproc handlers may legitimately mutate sample arrays in
            # place, so the one defensive copy happens here, in the worker
            # process, never at the broker.
            if len(frames) > 1:
                samples = Serialize.load_frames(frames[1:], writable=True)
            else:
                samples = Serialize.load(msg["samples_blob"])
            comp = self.pipeline[msg["subset"]]
            batch = comp.data_processor.process(samples, is_last=msg["is_last"],
                                                tag=msg["subset"])
            out = Serialize.dump_frames(batch)
            self.socket.send_multipart(
                [pickle.dumps({"type": "result", "task_id": task_id}), *out],
                copy=False)
        except Exception as e:
            LOGGER.warning("worker %d failed task: %r", self.worker_idx, e)
            self.socket.send(pickle.dumps({
                "type": "error", "task_id": task_id, "error": repr(e)}))

    def on_finish(self) -> None:
        self.socket.close(0)


class WorkerPool:
    def __init__(self, backend_addr: str, n_workers: int = 2):
        self.workers = [BatchWorker(backend_addr, i) for i in range(n_workers)]

    def start(self, timeout: float = 120.0) -> "WorkerPool":
        for w in self.workers:
            w.start(timeout)
        for w in self.workers:
            if not w.is_alive:
                self.stop()
                raise RuntimeError(f"{w.name} exited at startup (code {w.exitcode})")
        return self

    def stop(self) -> None:
        for w in self.workers:
            w.stop()

    def __len__(self) -> int:
        return len(self.workers)
