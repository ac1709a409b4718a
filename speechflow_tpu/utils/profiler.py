"""Env-gated wall-clock/stage profiling.

Capability parity with the reference profiler stack (speechflow/utils/profiler.py:20,
logging/server.py:70): ``Profiler`` context-manager timer with device sync for
JAX arrays, a process-wide event sink aggregating mean/std per tag, gated by
``DATAPIPE_PROFILING`` / ``MODEL_PROFILING`` env vars. On TPU, deep traces come
from ``jax.profiler``; this layer provides the cheap always-available counters.
"""

from __future__ import annotations

import os
import threading
import time
import typing as tp
from collections import defaultdict

__all__ = ["Profiler", "ProfilerSink", "profiling_enabled"]


def profiling_enabled(kind: str = "DATAPIPE") -> bool:
    return os.environ.get(f"{kind}_PROFILING", "0") not in ("0", "", "false", "False")


class ProfilerSink:
    """Thread-safe aggregate of (tag -> [durations])."""

    _lock = threading.Lock()
    _events: tp.Dict[str, tp.List[float]] = defaultdict(list)

    @classmethod
    def add(cls, tag: str, seconds: float) -> None:
        with cls._lock:
            cls._events[tag].append(seconds)

    @classmethod
    def summary(cls) -> tp.Dict[str, tp.Dict[str, float]]:
        import statistics

        with cls._lock:
            out = {}
            for tag, vals in cls._events.items():
                out[tag] = {
                    "count": len(vals),
                    "total": sum(vals),
                    "mean": statistics.fmean(vals),
                    "std": statistics.pstdev(vals) if len(vals) > 1 else 0.0,
                }
            return out

    @classmethod
    def reset(cls) -> None:
        with cls._lock:
            cls._events.clear()


class Profiler:
    """``with Profiler("stft"):`` — times the block; syncs JAX async dispatch."""

    def __init__(self, tag: str = "", enable: bool = True, device_sync: tp.Any = None):
        self.tag = tag
        self.enable = enable
        self.device_sync = device_sync  # a jax array (or pytree) to block_until_ready
        self.duration = 0.0
        self._t0 = 0.0

    def __enter__(self) -> "Profiler":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.device_sync is not None:
            try:
                import jax

                jax.block_until_ready(self.device_sync)
            except Exception:
                pass
        self.duration = time.perf_counter() - self._t0
        if self.enable and self.tag:
            ProfilerSink.add(self.tag, self.duration)
        return False

    def get_time(self) -> float:
        return self.duration
