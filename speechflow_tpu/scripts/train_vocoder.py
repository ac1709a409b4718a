"""Vocoder (GAN) training CLI.

Capability parity with ``python -m tts.vocoders.scripts.train`` (reference
vocoder train script + VocosLightningEngine wiring): data plane streaming
random audio chunks, Vocos generator + MPD/MRD discriminators, hinge GAN +
feature matching + mel/STFT reconstruction, alternating optimizers.

Usage:
  python -m speechflow_tpu.scripts.train_vocoder -c configs/vocoder_model.yml \
      -cd configs/vocoder_data_24khz.yml -vs debug
"""

from __future__ import annotations

import logging

from flax import nnx

from speechflow_tpu.logging import LoggingServer
from speechflow_tpu.models.vocoder import (
    Vocos,
    VocosParams,
    VocoderBatchProcessor,
    VocoderDiscriminator,
    vocoder_disc_criterion,
    vocoder_gen_criterion,
)
from speechflow_tpu.scripts.common import (
    build_data,
    config_prepare,
    optimizer_config,
    train_arguments,
    trainer_config,
)
from speechflow_tpu.training import GANTrainer
from speechflow_tpu.training.optimizer import OptimizerConfig
from speechflow_tpu.utils.init import filter_kwargs

LOGGER = logging.getLogger("speechflow_tpu")


def train(model_cfg, data_cfg, saver, callbacks=()) -> str:
    pipeline, bundle = build_data(data_cfg, model_cfg)
    try:
        params = VocosParams.create(model_cfg.section("model").to_dict())
        if params.feature_extractor == "tts":
            # E2E GAN-TTS (styletts2-class recipes): the acoustic model rides
            # inside the generator; fill its vocab sizes from the pipeline
            from speechflow_tpu.io import Config
            from speechflow_tpu.models.vocoder.tts_features import E2EBatchProcessor
            from speechflow_tpu.scripts.common import model_config_from_info

            params.tts_params = model_config_from_info(
                Config({"model": dict(params.tts_params)}), pipeline)
            batch_processor = E2EBatchProcessor()
        else:
            batch_processor = VocoderBatchProcessor()
        generator = Vocos(params, rngs=nnx.Rngs(0))
        disc_cfg = model_cfg.section("discriminator").to_dict()
        discriminator = VocoderDiscriminator(
            **filter_kwargs(VocoderDiscriminator.__init__, disc_cfg),
            rngs=nnx.Rngs(1))

        loss_cfg = model_cfg.section("loss").to_dict()
        gen_crit = vocoder_gen_criterion(
            sample_rate=params.sample_rate, n_mels=params.n_mels,
            **filter_kwargs(vocoder_gen_criterion, loss_cfg))
        disc_crit = vocoder_disc_criterion()

        saver.to_save["pipeline_info"] = pipeline.get_info()
        saver.to_save["model_params"] = params.to_dict()

        opt = optimizer_config(model_cfg)
        gan = GANTrainer(
            generator, discriminator, gen_crit, disc_crit,
            batch_processor,
            gen_optimizer=opt,
            disc_optimizer=OptimizerConfig.from_config(
                model_cfg.section("disc_optimizer").to_dict() or
                model_cfg.section("optimizer").to_dict()),
            config=trainer_config(model_cfg),
            saver=saver,
            disc_every=int(model_cfg.get_path("gan.disc_every", 1)),
            disc_start_iter=int(model_cfg.get_path("gan.disc_start_iter", 0)),
            tb_dir=saver.expr_path / "tb",
            evaluate_pesq=bool(model_cfg.get_path("gan.evaluate_pesq", False)),
        )
        resume_from = model_cfg.get_path("resume.from")
        if resume_from:
            from speechflow_tpu.training import ExperimentSaver

            ckpt = ExperimentSaver.get_last_checkpoint(resume_from)
            if ckpt is None:
                raise FileNotFoundError(f"no checkpoint under {resume_from}")
            gan.load_checkpoint(ckpt)
            LOGGER.info("resumed GAN from %s at step %d", ckpt, gan.global_step)
        disc_warmstart = model_cfg.get_path("warmstart.disc_from")
        if disc_warmstart:
            gan.warmstart_discriminator(disc_warmstart)
        last = gan.fit(bundle["train"], bundle.loaders.get("test"),
                       callbacks=callbacks)
        LOGGER.info("vocoder training done: %s", last)
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
