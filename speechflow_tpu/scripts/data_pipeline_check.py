"""Pipeline sanity checker (reference: tts/acoustic_models/scripts/
data_pipeline_check.py): build the pipeline from a data config, pull a few
batches, and report per-field shapes/dtypes/ranges + handler IO validation.

  python -m speechflow_tpu.scripts.data_pipeline_check -cd configs/tts_data_24khz.yml -vs debug
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-cd", "--data_config", required=True)
    p.add_argument("-vs", "--value_select", nargs="*", default=None)
    p.add_argument("--data_root", default=None)
    p.add_argument("--n_batches", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=2)
    args = p.parse_args(argv)

    from speechflow_tpu.data.core.components import DataPipeline
    from speechflow_tpu.data.core.registry import PipeRegistry
    from speechflow_tpu.io import Config

    cfg = Config.create_from_file(args.data_config, value_select=args.value_select)
    if args.data_root:
        cfg.set_path("dirs.data_root", args.data_root)
    dp = DataPipeline(cfg).init_components()

    report_lines = []
    for subset in dp.subsets:
        comp = dp[subset]
        report_lines.append(f"[{subset}] dataset: {len(comp.dataset)} samples")
        # dataflow contract check
        try:
            PipeRegistry.check(comp.preproc_fns,
                               initial_fields={"audio_chunk", "phonemes",
                                               "phoneme_timestamps", "text"})
            report_lines.append(f"[{subset}] handler IO contracts: OK")
        except ValueError as e:
            report_lines.append(f"[{subset}] handler IO contracts: {e}")
        for b in range(args.n_batches):
            batch = comp.sample_batch(args.batch_size)
            c = batch.collated_samples
            report_lines.append(f"[{subset}] batch {b}: size={batch.size} is_last={batch.is_last}")
            if c is None:
                continue
            for f in dataclasses.fields(c):
                v = getattr(c, f.name)
                if isinstance(v, np.ndarray):
                    report_lines.append(
                        f"    {f.name:24s} {str(v.shape):18s} {str(v.dtype):8s} "
                        f"[{np.nanmin(v):+.3g}, {np.nanmax(v):+.3g}]")
    print("\n".join(report_lines))
    return report_lines


def cli() -> None:
    """Console entry point (pyproject [project.scripts]): exit-code semantics
    want None, while :func:`main` returns its result for programmatic use."""
    main()


if __name__ == "__main__":
    main()
