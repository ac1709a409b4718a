"""Spawn-based process worker with a lifecycle contract.

Capability parity with the reference ProcessWorker
(speechflow/concurrency/process_worker.py:16): subclasses implement
``on_start`` / ``do_work_once`` / ``on_finish``; the parent observes shared
started/finished flags; ``none_stop`` restarts the loop on exceptions instead
of dying. Spawn (not fork) so JAX/XLA state never leaks into children.
"""

from __future__ import annotations

import logging
import multiprocessing as mp
import time
import traceback
import typing as tp

LOGGER = logging.getLogger("speechflow_tpu")

__all__ = ["ProcessWorker"]


class ProcessWorker:
    def __init__(self, none_stop: bool = False, name: tp.Optional[str] = None):
        ctx = mp.get_context("spawn")
        self._ctx = ctx
        self.none_stop = none_stop
        self.name = name or type(self).__name__
        self._started = ctx.Event()
        self._stop = ctx.Event()
        self._finished = ctx.Event()
        self._proc: tp.Optional[mp.Process] = None

    # -- lifecycle hooks (override) ---------------------------------------

    def on_start(self) -> None:
        pass

    def do_work_once(self) -> None:
        raise NotImplementedError

    def on_finish(self) -> None:
        pass

    # -- control ---------------------------------------------------------------

    def start(self, timeout: float = 60.0) -> "ProcessWorker":
        self._proc = self._ctx.Process(target=self._run, name=self.name, daemon=True)
        self._proc.start()
        if not self._started.wait(timeout):
            raise TimeoutError(f"{self.name} did not start within {timeout}s")
        return self

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        if self._proc is not None:
            self._proc.join(timeout)
            if self._proc.is_alive():
                self._proc.terminate()
                self._proc.join(5)

    def __enter__(self) -> "ProcessWorker":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    @property
    def is_started(self) -> bool:
        return self._started.is_set()

    @property
    def is_finished(self) -> bool:
        return self._finished.is_set()

    @property
    def is_alive(self) -> bool:
        return self._proc is not None and self._proc.is_alive()

    @property
    def exitcode(self) -> tp.Optional[int]:
        return None if self._proc is None else self._proc.exitcode

    # -- child body ---------------------------------------------------------------

    def _run(self) -> None:
        try:
            self.on_start()
        except Exception:
            traceback.print_exc()
            self._started.set()  # unblock parent; it will see a dead process
            self._finished.set()
            raise
        self._started.set()
        while not self._stop.is_set():
            try:
                self.do_work_once()
            except Exception as e:
                LOGGER.warning("%s: do_work_once raised %r", self.name, e)
                traceback.print_exc()
                if not self.none_stop:
                    break
                time.sleep(0.5)
        try:
            self.on_finish()
        finally:
            self._finished.set()
