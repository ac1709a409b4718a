"""Forced-aligner training CLI (2-stage MFA recipe).

Capability parity with ``python -m tts.forced_alignment.scripts.train``
(reference 2-stage configs, SURVEY §A.3): stage 1 trains on TextGrid pauses
from text; stage 2 re-reads stage-1 timestamps with short-pause merging; the
annotator then applies the trained aligner to emit TextGridStage files.

Usage:
  python -m speechflow_tpu.scripts.train_aligner -c configs/aligner_model.yml \
      -cd configs/tts_data_24khz.yml -vs debug --stage 1
"""

from __future__ import annotations

import logging

from flax import nnx

from speechflow_tpu.logging import LoggingServer
from speechflow_tpu.models.aligner import (
    AlignerBatchProcessor,
    AlignerCriterion,
    GlowTTSAligner,
    GlowTTSParams,
)
from speechflow_tpu.scripts.common import (
    apply_resume_warmstart,
    build_data,
    config_prepare,
    model_config_from_info,
    optimizer_config,
    train_arguments,
    trainer_config,
)
from speechflow_tpu.training import Trainer

LOGGER = logging.getLogger("speechflow_tpu")


def train(model_cfg, data_cfg, saver) -> str:
    pipeline, bundle = build_data(data_cfg, model_cfg)
    try:
        m_dict = model_config_from_info(model_cfg, pipeline)
        params = GlowTTSParams.create(m_dict)
        model = GlowTTSAligner(params, rngs=nnx.Rngs(0))
        criterion = AlignerCriterion(
            duration_scale=float(model_cfg.get_path("loss.duration_scale", 1.0)))

        saver.to_save["pipeline_info"] = pipeline.get_info()
        saver.to_save["model_params"] = params.to_dict()

        trainer = Trainer(model, criterion, AlignerBatchProcessor(),
                          optimizer_config(model_cfg), trainer_config(model_cfg),
                          saver=saver, tb_dir=saver.expr_path / "tb")
        apply_resume_warmstart(trainer, model_cfg)
        last = trainer.fit(bundle["train"])
        LOGGER.info("aligner training done: %s", last)
        return str(saver.expr_path)
    finally:
        bundle.shutdown()


def main(argv=None) -> str:
    args = train_arguments().parse_args(argv)
    model_cfg, data_cfg, saver = config_prepare(args)
    with LoggingServer.ctx(saver.expr_path):
        return train(model_cfg, data_cfg, saver)


def cli() -> None:
    """Console entry point (pyproject [project.scripts]): exit-code semantics
    want None, while :func:`main` returns its result for programmatic use."""
    main()


if __name__ == "__main__":
    main()
