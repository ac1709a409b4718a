"""Per-process singleton registry for dataset-level handlers
(reference: speechflow/data_pipeline/core/meta.py:5)."""

from __future__ import annotations

import threading

__all__ = ["Singleton"]


class Singleton(type):
    _instances: dict = {}
    _lock = threading.Lock()

    def __call__(cls, *args, **kwargs):
        key = (cls, threading.get_ident())
        if key not in cls._instances:
            with cls._lock:
                if key not in cls._instances:
                    cls._instances[key] = super().__call__(*args, **kwargs)
        return cls._instances[key]

    @classmethod
    def clear(mcs, klass=None):
        if klass is None:
            mcs._instances.clear()
        else:
            for k in [k for k in mcs._instances if k[0] is klass]:
                del mcs._instances[k]
