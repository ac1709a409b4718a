"""Per-sample preprocessing chain + collate -> Batch, with a feature dump cache.

Capability parity with the reference DataProcessor/DumpProcessor
(speechflow/data_pipeline/core/data_processor.py:331,53):

* ``DataProcessor.process`` runs the ordered handler chain over each sample
  (per-handler profiling when ``DATAPIPE_PROFILING=1``; corrupted samples are
  skipped and blacklisted when ``skip_corrupted_samples``), then collates the
  survivors into a :class:`Batch`.
* ``DumpProcessor`` is the feature cache: one ``.pkl`` per sample (sha256 of
  its path/uid) storing selected fields keyed ``handler|param-hash``; cached
  handlers are skipped on subsequent runs (``apply_or_not``), an
  ``update_handlers`` list forces recompute, and broken samples are appended
  to ``skip_samples.txt``.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import typing as tp
from pathlib import Path

from speechflow_tpu.data.core.batch import Batch
from speechflow_tpu.data.core.datasample import DataSample
from speechflow_tpu.data.core.registry import PipeRegistry
from speechflow_tpu.utils.profiler import Profiler, profiling_enabled

LOGGER = logging.getLogger("speechflow_tpu")

__all__ = ["DataProcessor", "DumpProcessor"]


def _handler_key(fn: tp.Callable, params: tp.Optional[dict] = None) -> str:
    name = PipeRegistry.meta(fn)["name"]
    ph = hashlib.sha256(repr(sorted((params or {}).items())).encode()).hexdigest()[:8]
    return f"{name}|{ph}"


class DumpProcessor:
    def __init__(
        self,
        dump_path: tp.Union[str, Path],
        fields: tp.Sequence[str] = (),
        handlers: tp.Sequence[str] = (),
        update_handlers: tp.Sequence[str] = (),
        full_dump: bool = False,
        persist_blacklist: bool = True,
    ):
        self.dump_path = Path(dump_path)
        self.dump_path.mkdir(parents=True, exist_ok=True)
        self.fields = set(fields)
        self.handlers = set(handlers)
        self.update_handlers = set(update_handlers)
        self.full_dump = full_dump
        self.persist_blacklist = persist_blacklist
        self._skip_file = self.dump_path / "skip_samples.txt"
        self.skip_samples: tp.Set[str] = set()
        if self.persist_blacklist and self._skip_file.exists():
            self.skip_samples = set(self._skip_file.read_text().splitlines())

    def _file_for(self, ds: DataSample) -> Path:
        key = hashlib.sha256(str(ds.file_path or ds.uid).encode()).hexdigest()
        return self.dump_path / f"{key}.pkl"

    def load(self, ds: DataSample) -> dict:
        f = self._file_for(ds)
        if f.exists():
            try:
                return pickle.loads(f.read_bytes())
            except Exception:
                LOGGER.warning("corrupt dump file %s, ignoring", f)
        return {}

    def save(self, ds: DataSample, payload: dict) -> None:
        # atomic replace: concurrent workers may write the same sample's cache;
        # a reader must never observe a partially written pickle
        target = self._file_for(ds)
        tmp = target.with_suffix(f".{os.getpid()}.tmp")
        tmp.write_bytes(pickle.dumps(payload, protocol=5))
        os.replace(tmp, target)

    def is_cached(self, ds: DataSample, fn: tp.Callable, params: tp.Optional[dict],
                  cache: dict) -> bool:
        name = PipeRegistry.meta(fn)["name"]
        if name in self.update_handlers:
            return False
        if self.full_dump or name in self.handlers:
            return _handler_key(fn, params) in cache
        return False

    def apply_cached(self, ds: DataSample, fn: tp.Callable, params: tp.Optional[dict],
                     cache: dict) -> None:
        stored = cache[_handler_key(fn, params)]
        for k, v in stored.items():
            if hasattr(ds, k):
                setattr(ds, k, v)
            else:
                ds.additional[k] = v

    def store_outputs(self, ds: DataSample, fn: tp.Callable, params: tp.Optional[dict],
                      cache: dict) -> bool:
        meta = PipeRegistry.meta(fn)
        name = meta["name"]
        if not (self.full_dump or name in self.handlers):
            return False
        outs = {}
        for field_name in meta["outputs"] | (self.fields & set(meta["outputs"])):
            val = ds.get(field_name)
            if val is not None:
                outs[field_name] = val
        cache[_handler_key(fn, params)] = outs
        return True

    def blacklist(self, ds: DataSample) -> None:
        key = str(ds.file_path or ds.uid)
        if key not in self.skip_samples:
            self.skip_samples.add(key)
            if self.persist_blacklist:
                with self._skip_file.open("a") as f:
                    f.write(key + "\n")


class DataProcessor:
    def __init__(
        self,
        preproc_fns: tp.Sequence[tp.Callable[[DataSample], DataSample]] = (),
        collate_fn: tp.Optional[tp.Callable[[tp.List[DataSample]], tp.Any]] = None,
        handler_params: tp.Optional[tp.Dict[str, dict]] = None,
        skip_corrupted_samples: bool = True,
        dump_processor: tp.Optional[DumpProcessor] = None,
    ):
        self.preproc_fns = list(preproc_fns)
        self.collate_fn = collate_fn
        self.handler_params = handler_params or {}
        self.skip_corrupted_samples = skip_corrupted_samples
        self.dump = dump_processor

    def process_sample(self, ds: DataSample) -> tp.Optional[DataSample]:
        cache = self.dump.load(ds) if self.dump else {}
        dirty = False
        if self.dump and str(ds.file_path or ds.uid) in self.dump.skip_samples:
            return None
        try:
            for fn in self.preproc_fns:
                name = PipeRegistry.meta(fn)["name"]
                params = self.handler_params.get(name)
                if self.dump and self.dump.is_cached(ds, fn, params, cache):
                    self.dump.apply_cached(ds, fn, params, cache)
                    continue
                with Profiler(f"handler.{name}", enable=profiling_enabled("DATAPIPE")):
                    ds = fn(ds)
                if ds is None:
                    return None
                if self.dump:
                    dirty |= self.dump.store_outputs(ds, fn, params, cache)
        except Exception as e:
            LOGGER.warning("sample %s failed in preproc: %r", ds.file_path, e)
            if self.dump:
                self.dump.blacklist(ds)
            if self.skip_corrupted_samples:
                return None
            raise
        if self.dump and dirty:
            self.dump.save(ds, cache)
        return ds

    def process(self, samples: tp.Sequence[DataSample], is_last: bool = False,
                tag: tp.Optional[str] = None) -> tp.Optional[Batch]:
        processed = []
        for ds in samples:
            out = self.process_sample(ds)
            if out is not None:
                processed.append(out)
        if not processed:
            return None
        collated = self.collate_fn(processed) if self.collate_fn else None
        return Batch(size=len(processed), is_last=is_last,
                     data_samples=processed, collated_samples=collated, tag=tag)
