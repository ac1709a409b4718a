"""ctypes bindings for the native batch-assembly core (native/batch_pack.cpp).

The collate pad-and-stack is the data plane's per-batch hot loop (runs in
every BatchWorker for every batch); the C++ core does the ragged->padded
copies in one pass. Compiled lazily with g++ on first use and cached next to
the source; every call site falls back to numpy when the toolchain or .so is
unavailable (``stack_and_pad`` in utils/pad.py dispatches here).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
import typing as tp
from pathlib import Path

import numpy as np

LOGGER = logging.getLogger("speechflow_tpu")

__all__ = ["native_pack", "native_available"]

_SRC = Path(__file__).resolve().parents[2] / "native" / "batch_pack.cpp"
_SO = _SRC.parent / "libbatch_pack.so"
_lock = threading.Lock()
_lib: tp.Optional[ctypes.CDLL] = None
_tried = False


def _load() -> tp.Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                # atomic build: worker processes may race on first use
                import os
                import tempfile

                fd, tmp = tempfile.mkstemp(suffix=".so", dir=str(_SO.parent))
                os.close(fd)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     str(_SRC), "-o", tmp],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, _SO)
            lib = ctypes.CDLL(str(_SO))
            for name, ptr_t, pad_t in (("pack_f32", ctypes.c_float, ctypes.c_float),
                                       ("pack_i32", ctypes.c_int32, ctypes.c_int32)):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int
                fn.argtypes = [
                    ctypes.POINTER(ctypes.POINTER(ptr_t)),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    pad_t, ctypes.POINTER(ptr_t),
                ]
            _lib = lib
        except Exception as e:  # noqa: BLE001
            LOGGER.info("native batch_pack unavailable (%r); using numpy", e)
            _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def native_pack(arrays: tp.Sequence[np.ndarray], t_max: int,
                pad_value: float = 0.0) -> tp.Optional[np.ndarray]:
    """Pack ragged (T_i,) or (T_i, D) arrays into (N, t_max[, D]).

    Returns None when the native library is unavailable or dtypes unsupported
    (caller falls back to numpy).
    """
    lib = _load()
    if lib is None or not arrays:
        return None
    a0 = arrays[0]
    if a0.dtype == np.float32:
        fn, ctype = lib.pack_f32, ctypes.c_float
    elif a0.dtype == np.int32:
        fn, ctype = lib.pack_i32, ctypes.c_int32
    else:
        return None
    # dtype/row-shape are taken from arrays[0]; a mismatching later array
    # would make the C side read past its buffer — fall back to numpy (which
    # raises a clear error on ragged trailing dims) instead
    if any(a.dtype != a0.dtype or a.shape[1:] != a0.shape[1:] for a in arrays[1:]):
        return None
    row_elems = 1 if a0.ndim == 1 else int(np.prod(a0.shape[1:]))
    n = len(arrays)
    arrays = [np.ascontiguousarray(a) for a in arrays]
    ptrs = (ctypes.POINTER(ctype) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctype)) for a in arrays])
    lens = (ctypes.c_int64 * n)(*[a.shape[0] for a in arrays])
    out_shape = (n, t_max) if a0.ndim == 1 else (n, t_max) + a0.shape[1:]
    out = np.empty(out_shape, a0.dtype)
    rc = fn(ptrs, lens, n, t_max, row_elems, a0.dtype.type(pad_value),
            out.ctypes.data_as(ctypes.POINTER(ctype)))
    return out if rc == 0 else None
