"""Central log aggregation over ZMQ.

Capability parity with the reference LoggingServer / ZeroMQFileHandler
(speechflow/logging/server.py:50, logging/logger.py:56): every process
attaches a ZMQ PUSH handler to the root logger; a LoggingServer thread/process
PULLs records and writes a single experiment log file, also aggregating
profiler events (mean/std per tag) shipped through the same channel.
"""

from __future__ import annotations

import logging
import logging.handlers
import pickle
import threading
import typing as tp
from pathlib import Path

import zmq

__all__ = ["LoggingServer", "attach_zmq_handler"]


class ZMQPushHandler(logging.Handler):
    def __init__(self, address: str):
        super().__init__()
        ctx = zmq.Context.instance()
        self.socket = ctx.socket(zmq.PUSH)
        self.socket.setsockopt(zmq.LINGER, 500)
        self.socket.connect(address)

    def emit(self, record: logging.LogRecord) -> None:
        try:
            msg = {
                "kind": "log",
                "name": record.name,
                "level": record.levelno,
                "msg": self.format(record),
                "pid": record.process,
            }
            self.socket.send(pickle.dumps(msg), zmq.NOBLOCK)
        except Exception:
            pass


def attach_zmq_handler(address: str, level: int = logging.INFO) -> ZMQPushHandler:
    h = ZMQPushHandler(address)
    h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    h.setLevel(level)
    logging.getLogger().addHandler(h)
    return h


class LoggingServer:
    """PULL-collector writing one log file; runs as a daemon thread.

    Use as a context manager around training
    (reference call sites: train scripts wrap everything in LoggingServer.ctx).
    """

    def __init__(self, log_file: tp.Union[str, Path], address: tp.Optional[str] = None):
        self.log_file = Path(log_file)
        self.log_file.parent.mkdir(parents=True, exist_ok=True)
        ctx = zmq.Context.instance()
        self.socket = ctx.socket(zmq.PULL)
        if address is None:
            port = self.socket.bind_to_random_port("tcp://127.0.0.1")
            self.address = f"tcp://127.0.0.1:{port}"
        else:
            self.socket.bind(address)
            self.address = address
        self._stop = threading.Event()
        self._thread: tp.Optional[threading.Thread] = None
        self.profiler_events: tp.Dict[str, tp.List[float]] = {}
        self.pids: tp.Set[int] = set()

    @staticmethod
    def ctx(experiment_path: tp.Union[str, Path]) -> "LoggingServer":
        return LoggingServer(Path(experiment_path) / "experiment.log")

    def __enter__(self) -> "LoggingServer":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        attach_zmq_handler(self.address)
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(3)
        self._write_profiler_summary()

    def _loop(self) -> None:
        poller = zmq.Poller()
        poller.register(self.socket, zmq.POLLIN)
        with self.log_file.open("a") as f:
            while not self._stop.is_set():
                if not poller.poll(200):
                    continue
                try:
                    msg = pickle.loads(self.socket.recv(zmq.NOBLOCK))
                except Exception:
                    continue
                if msg.get("kind") == "log":
                    self.pids.add(msg.get("pid"))
                    f.write(msg["msg"] + "\n")
                    f.flush()
                elif msg.get("kind") == "profiler":
                    self.profiler_events.setdefault(msg["tag"], []).append(msg["seconds"])

    def _write_profiler_summary(self) -> None:
        if not self.profiler_events:
            return
        import statistics

        with self.log_file.open("a") as f:
            f.write("=== profiler summary ===\n")
            for tag, vals in sorted(self.profiler_events.items()):
                f.write(
                    f"{tag}: n={len(vals)} mean={statistics.fmean(vals)*1e3:.2f}ms "
                    f"std={(statistics.pstdev(vals) if len(vals)>1 else 0)*1e3:.2f}ms\n"
                )
