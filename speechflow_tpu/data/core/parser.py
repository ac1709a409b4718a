"""Dataset parser base: metadata files -> DataSamples with multiprocess preproc.

Capability parity with the reference BaseDSParser
(speechflow/data_pipeline/core/base_ds_parser.py:51): ``read_datasamples``
maps a file list through ``reader`` (file -> list of Metadata dicts), then
pushes every metadata record through an ordered chain of preprocessing steps
(any step may drop a record by returning None), finally ``to_datasample``
converts surviving records; the heavy stages run in a spawn-based process pool
with chunking, and the parsed result can be disk-cached keyed by the
preproc-parameter hash.
"""

from __future__ import annotations

import hashlib
import logging
import multiprocessing as mp
import pickle
import typing as tp
from pathlib import Path

from speechflow_tpu.data.core.dataset import Dataset
from speechflow_tpu.data.core.datasample import DataSample

LOGGER = logging.getLogger("speechflow_tpu")

Metadata = tp.Dict[str, tp.Any]

__all__ = ["BaseDSParser", "Metadata"]


def _process_chunk(args):
    parser, files = args
    out = []
    for f in files:
        try:
            for md in parser.reader(f):
                md = parser.run_preprocessing(md)
                if md is not None:
                    ds = parser.to_datasample(md)
                    if ds is not None:
                        out.append(ds)
        except Exception as e:
            LOGGER.warning("parser failed on %s: %r", f, e)
            if not parser.skip_corrupted:
                raise
    return out


class BaseDSParser:
    """Subclasses implement ``reader`` and ``to_datasample``; optional
    ``preprocessing`` returns the ordered list of metadata transforms."""

    def __init__(
        self,
        preproc_fns: tp.Optional[tp.Sequence[tp.Callable[[Metadata], tp.Optional[Metadata]]]] = None,
        n_processes: int = 0,
        chunk_size: int = 100,
        skip_corrupted: bool = True,
        cache_dir: tp.Optional[tp.Union[str, Path]] = None,
    ):
        self.preproc_fns = list(preproc_fns or [])
        self.n_processes = n_processes
        self.chunk_size = chunk_size
        self.skip_corrupted = skip_corrupted
        self.cache_dir = Path(cache_dir) if cache_dir else None

    # -- to implement ---------------------------------------------------------

    def reader(self, path: tp.Union[str, Path]) -> tp.List[Metadata]:
        raise NotImplementedError

    def to_datasample(self, md: Metadata) -> tp.Optional[DataSample]:
        raise NotImplementedError

    # -- machinery -------------------------------------------------------------

    def run_preprocessing(self, md: Metadata) -> tp.Optional[Metadata]:
        for fn in self.preproc_fns:
            md = fn(md)
            if md is None:
                return None
        return md

    def _cache_key(self, files: tp.Sequence[str]) -> str:
        blob = repr((sorted(str(f) for f in files),
                     [getattr(f, "__name__", str(f)) for f in self.preproc_fns],
                     type(self).__name__)).encode()
        return hashlib.sha256(blob).hexdigest()[:24]

    def read_datasamples(
        self,
        files: tp.Sequence[tp.Union[str, Path]],
        memory_save: bool = False,
        progress: bool = False,
    ) -> Dataset:
        if self.cache_dir is not None:
            cache_file = self.cache_dir / f"parsed_{self._cache_key(files)}.pkl"
            if cache_file.exists():
                LOGGER.info("parser cache hit: %s", cache_file)
                samples = pickle.loads(cache_file.read_bytes())
                return Dataset(samples, memory_save=memory_save)

        chunks = [list(files[i : i + self.chunk_size]) for i in range(0, len(files), self.chunk_size)]
        samples: tp.List[DataSample] = []
        if self.n_processes and self.n_processes > 1 and len(chunks) > 1:
            ctx = mp.get_context("spawn")
            with ctx.Pool(self.n_processes) as pool:
                it = pool.imap_unordered(_process_chunk, [(self, c) for c in chunks])
                if progress:
                    from tqdm import tqdm

                    it = tqdm(it, total=len(chunks), desc="parsing")
                for part in it:
                    samples.extend(part)
        else:
            for c in chunks:
                samples.extend(_process_chunk((self, c)))

        for i, s in enumerate(samples):
            s.index = i

        if self.cache_dir is not None:
            self.cache_dir.mkdir(parents=True, exist_ok=True)
            cache_file.write_bytes(pickle.dumps(samples, protocol=5))

        return Dataset(samples, memory_save=memory_save)
