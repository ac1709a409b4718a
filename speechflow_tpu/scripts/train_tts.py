"""Acoustic-model training CLI.

Capability parity with ``python -m tts.acoustic_models.scripts.train``
(reference scripts/train.py:168, call stack in SURVEY §3.1):
LoggingServer -> data plane (server + workers + loaders) -> model/criterion/
optimizer from config + pipeline info -> Trainer.fit with checkpoints that
embed configs, alphabet and speaker maps.

Usage:
  python -m speechflow_tpu.scripts.train_tts -c configs/tts_model.yml \
      -cd configs/tts_data_24khz.yml -vs debug
"""

from __future__ import annotations

import logging

from flax import nnx

from speechflow_tpu.logging import LoggingServer
from speechflow_tpu.models.tts import (
    ParallelTTSModel,
    ParallelTTSParams,
    TTSBatchProcessor,
    TTSCriterion,
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
from speechflow_tpu.training import ExperimentSaver, Trainer
from speechflow_tpu.utils.init import filter_kwargs

LOGGER = logging.getLogger("speechflow_tpu")


def train(model_cfg, data_cfg, saver, callbacks=()) -> str:
    if (model_cfg.get_path("model.type") == "xtts"
            and model_cfg.get_path("model.use_prompt", False)
            and data_cfg.get_path("collate.type") == "TTSCollate"):
        # prompt-conditioned XTTS needs same-speaker prompt pairing
        # (reference wires TTSCollateWithPrompt for the XTTS recipes,
        # speechflow/data_pipeline/collate_functions/tts_collate.py:157)
        data_cfg.set_path("collate.type", "TTSCollateWithPrompt")
    pipeline, bundle = build_data(data_cfg, model_cfg)
    try:
        m_dict = model_config_from_info(model_cfg, pipeline)
        model_type = m_dict.pop("type", "parallel")
        if model_type == "xtts":
            # GPT over codec tokens (reference: XTTSDecoder + GPTA recipes)
            from speechflow_tpu.models.tts import (
                XTTSBatchProcessor,
                XTTSModel,
                XTTSParams,
                xtts_criterion,
            )

            m_dict.pop("n_langs", None)  # XTTS conditions on speaker only
            # mel bins size the audio-prompt conditioning encoder, not the
            # GPT targets (those are codec tokens)
            n_mels = m_dict.pop("n_mels", None)
            if m_dict.get("use_prompt") and n_mels and "prompt_dim" not in m_dict:
                m_dict["prompt_dim"] = int(n_mels)
            params = XTTSParams.create(m_dict)
            model = XTTSModel(params, rngs=nnx.Rngs(0))
            criterion = xtts_criterion()
            batch_processor = XTTSBatchProcessor()
        else:
            params = ParallelTTSParams.create(m_dict)
            model = ParallelTTSModel(params, rngs=nnx.Rngs(0))
            loss_cfg = model_cfg.section("loss").to_dict()
            criterion = TTSCriterion(**filter_kwargs(TTSCriterion.__init__, loss_cfg))
            batch_processor = TTSBatchProcessor()

        info = pipeline.get_info()
        saver.to_save["pipeline_info"] = info
        saver.to_save["model_params"] = params.to_dict()

        if model_cfg.get_path("experiment.train_g2p", True):
            # every experiment ships a raw-text frontend: mine the corpus
            # word/phoneme tiers and train the G2P into the experiment dir,
            # where TTSEvaluationInterface auto-discovers it
            try:
                from speechflow_tpu.scripts.train_g2p import train_g2p_artifact

                train_g2p_artifact(
                    data_cfg.get_path("dirs.data_root"),
                    saver.expr_path / "g2p.pkl",
                    steps=int(model_cfg.get_path("experiment.g2p_steps", 1200)),
                    ensemble=int(model_cfg.get_path("experiment.g2p_ensemble", 3)))
            except Exception as e:  # G2P failure must never kill training
                LOGGER.warning("G2P training skipped: %s", e)

        trainer = Trainer(
            model, criterion, batch_processor,
            optimizer_config(model_cfg), trainer_config(model_cfg),
            saver=saver, tb_dir=saver.expr_path / "tb",
        )
        apply_resume_warmstart(trainer, model_cfg)
        last = trainer.fit(bundle["train"],
                           bundle.loaders.get("test"), callbacks=callbacks)
        LOGGER.info("training done: %s", last)
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
