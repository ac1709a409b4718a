"""Feature dump: precompute expensive handlers + dataset statistics.

Capability parity with ``python -m tts.acoustic_models.scripts.dump``
(reference scripts/dump.py:276, call stack SURVEY §3.5): iterate every sample
of both subsets with a DumpProcessor so the per-sample feature cache fills,
then compute post-preproc per-speaker statistics ranges (``ranges.json`` — the
file the reference's StatisticsRange singleton consumes) and prosody pitch
contour clusters (KMeans over per-word contours; reference uses
Annoy/FeatureAgglomeration) saved as ``prosody_centroids.npy``.

Usage:
  python -m speechflow_tpu.scripts.dump -cd configs/tts_data_24khz.yml \
      -vs debug --dump_path /data/dump [--data_root ...]
"""

from __future__ import annotations

import argparse
import json
import logging
import typing as tp
from pathlib import Path

import numpy as np

from speechflow_tpu.data.core.components import DataPipeline
from speechflow_tpu.io import Config

LOGGER = logging.getLogger("speechflow_tpu")


def extract_pitch_contours(samples, n_points: int = 10) -> np.ndarray:
    """Per-word voiced-pitch contours resampled to n_points
    (reference ContoursExtractor, tts_processors.py:985)."""
    contours = []
    for ds in samples:
        if ds.pitch is None or ds.durations is None:
            continue
        edges = np.concatenate([[0], np.cumsum(ds.durations.astype(np.int64))])
        for i in range(len(ds.durations)):
            seg = ds.pitch[edges[i]: edges[i + 1]]
            v = seg[seg > 0]
            if len(v) < 3:
                continue
            idx = np.linspace(0, len(v) - 1, n_points)
            contour = np.interp(idx, np.arange(len(v)), v)
            contour = contour / max(contour.mean(), 1e-6)  # normalize level
            contours.append(contour)
    return np.asarray(contours, np.float32) if contours else np.zeros((0, n_points), np.float32)


def cluster_contours(contours: np.ndarray, n_clusters: int = 8) -> np.ndarray:
    if len(contours) < n_clusters:
        return contours
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=n_clusters, n_init=4, random_state=0).fit(contours)
    return km.cluster_centers_.astype(np.float32)


def compute_ranges(samples) -> tp.Dict[str, dict]:
    """Post-preproc per-speaker feature ranges — what StatisticsRange.fit
    cannot see at parse time (features exist only after the handler chain)."""
    from speechflow_tpu.data.processors.singletons import StatisticsRange

    sr = StatisticsRange()
    # fit() walks the dataset; give it a shim with processed samples
    class _DS:
        def __init__(self, items):
            self._items = items

        def __iter__(self):
            return iter(self._items)

        def __len__(self):
            return len(self._items)

    sr.fit(_DS(samples))
    return sr.ranges


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("-cd", "--data_config", required=True)
    p.add_argument("-vs", "--value_select", nargs="*", default=None)
    p.add_argument("--dump_path", required=True)
    p.add_argument("--data_root", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--n_prosody_clusters", type=int, default=8)
    p.add_argument("--full_dump", action="store_true", default=True)
    args = p.parse_args(argv)

    dump_path = Path(args.dump_path)
    dump_path.mkdir(parents=True, exist_ok=True)

    cfg = Config.create_from_file(args.data_config, value_select=args.value_select)
    if args.data_root:
        cfg.set_path("dirs.data_root", args.data_root)
    cfg.set_path("processor.dump.dump_path", str(dump_path))
    cfg.set_path("processor.dump.full_dump", True)

    pipeline = DataPipeline(cfg).init_components()
    report = {"subsets": {}}
    all_samples = []
    for subset in pipeline.subsets:
        comp = pipeline[subset]
        n = 0
        for i in range(len(comp.dataset)):
            out = comp.data_processor.process_sample(comp.dataset[i].copy())
            if out is not None:
                all_samples.append(out)
                n += 1
        report["subsets"][subset] = n
        LOGGER.info("dumped %d samples for %s", n, subset)

    ranges = compute_ranges(all_samples)
    (dump_path / "ranges.json").write_text(json.dumps(ranges, indent=2))
    report["speakers_with_ranges"] = len(ranges)

    contours = extract_pitch_contours(all_samples)
    centroids = cluster_contours(contours, args.n_prosody_clusters)
    np.save(dump_path / "prosody_centroids.npy", centroids)
    report["n_contours"] = int(len(contours))
    report["n_prosody_clusters"] = int(len(centroids))

    (dump_path / "dump_report.json").write_text(json.dumps(report, indent=2))
    LOGGER.info("dump complete: %s", report)
    return report


def cli() -> None:
    """Console entry point (pyproject [project.scripts]): exit-code semantics
    want None, while :func:`main` returns its result for programmatic use."""
    main()


if __name__ == "__main__":
    main()
