"""Prosody annotation: write a per-word prosody-class tier into segas.

Capability parity with ``tts.acoustic_models.scripts.prosody_annotation``:
assigns each word a contour class by nearest-centroid match against the dump
script's clustered pitch contours (prosody_centroids.npy) and writes the
``prosody`` tier back into .TextGridStage3 files — the labels the prosody NLP
model then learns to predict from text.

  python -m speechflow_tpu.scripts.prosody_annotation \
      -cd configs/tts_data_24khz.yml -vs debug --dump_path <dump> [--data_root ...]
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

LOGGER = logging.getLogger("speechflow_tpu")


def assign_contour_class(pitch: np.ndarray, durations: np.ndarray,
                         centroids: np.ndarray, n_points: int = 10) -> np.ndarray:
    """Per-token class (or -1 when unvoiced/too short)."""
    edges = np.concatenate([[0], np.cumsum(durations.astype(np.int64))])
    out = np.full(len(durations), -1, np.int64)
    for i in range(len(durations)):
        seg = pitch[edges[i]: edges[i + 1]]
        v = seg[seg > 0]
        if len(v) < 3:
            continue
        contour = np.interp(np.linspace(0, len(v) - 1, n_points),
                            np.arange(len(v)), v)
        contour = contour / max(contour.mean(), 1e-6)
        out[i] = int(np.argmin(np.linalg.norm(centroids - contour, axis=1)))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-cd", "--data_config", required=True)
    p.add_argument("-vs", "--value_select", nargs="*", default=None)
    p.add_argument("--dump_path", required=True)
    p.add_argument("--data_root", default=None)
    args = p.parse_args(argv)

    from speechflow_tpu.data.core.components import DataPipeline
    from speechflow_tpu.io import AudioSeg, Config, Tier

    centroids = np.load(Path(args.dump_path) / "prosody_centroids.npy")
    cfg = Config.create_from_file(args.data_config, value_select=args.value_select)
    if args.data_root:
        cfg.set_path("dirs.data_root", args.data_root)
    cfg.set_path("processor.dump.dump_path", str(args.dump_path))
    cfg.set_path("processor.dump.full_dump", True)

    dp = DataPipeline(cfg).init_components()
    n_annotated = 0
    for subset in dp.subsets:
        comp = dp[subset]
        for i in range(len(comp.dataset)):
            ds = comp.data_processor.process_sample(comp.dataset[i].copy())
            if ds is None or ds.pitch is None or ds.durations is None:
                continue
            classes = assign_contour_class(ds.pitch, ds.durations, centroids)
            seg = AudioSeg.load(ds.sega_path)
            # one label per word: majority over the word's tokens
            words = seg.words()
            phs = seg.phonemes()
            labels = []
            for wb, we, _ in words:
                tok_cls = [classes[k + 1] if k + 1 < len(classes) else -1  # +1: BOS row
                           for k, (b, e, _) in enumerate(phs)
                           if b >= wb - 1e-6 and e <= we + 1e-6]
                tok_cls = [c for c in tok_cls if c >= 0]
                labels.append(str(max(set(tok_cls), key=tok_cls.count)) if tok_cls else "undefined")
            intervals = [(wb, we, lab) for (wb, we, _), lab in zip(words, labels)]
            seg.grid.add(Tier("prosody", intervals))
            seg.save(ds.sega_path)
            n_annotated += 1
    LOGGER.info("annotated %d segas with prosody classes", n_annotated)
    print(f"annotated {n_annotated} segas ({len(centroids)} classes)")
    return n_annotated


def cli() -> None:
    """Console entry point (pyproject [project.scripts]): exit-code semantics
    want None, while :func:`main` returns its result for programmatic use."""
    main()


if __name__ == "__main__":
    main()
