"""Shared CLI/train-script scaffolding.

Capability parity with the reference config_prepare / train_arguments
(speechflow/training/utils/config_prepare.py:72,145): parse -c model config /
-cd data config / -vs value-select flags / -r resume dir, apply value_select,
create the experiment dir + saver, wire the data plane, and update the model
config from pipeline info (alphabet size, n_speakers, n_langs, n_mels) — the
analogue of the reference's update_model_config <- DataClient.find_info.
"""

from __future__ import annotations

import argparse
import logging
import typing as tp
from pathlib import Path

from speechflow_tpu.data.core.components import DataPipeline
from speechflow_tpu.io import Config
from speechflow_tpu.server import LoaderBundle, init_data_loader
from speechflow_tpu.training import ExperimentSaver
from speechflow_tpu.training.optimizer import OptimizerConfig
from speechflow_tpu.training.trainer import TrainerConfig

LOGGER = logging.getLogger("speechflow_tpu")

__all__ = ["train_arguments", "config_prepare", "build_data", "model_config_from_info",
           "apply_resume_warmstart"]


def train_arguments() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--model_config", required=True)
    p.add_argument("-cd", "--data_config", required=True)
    p.add_argument("-vs", "--value_select", nargs="*", default=None)
    p.add_argument("-r", "--resume_from", default=None)
    p.add_argument("-w", "--warmstart", default=None)
    p.add_argument("--data_root", default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="force the jax backend (the ambient sitecustomize "
                        "overrides JAX_PLATFORMS, so an env var is not enough)")
    return p


def config_prepare(args) -> tp.Tuple[Config, Config, ExperimentSaver]:
    from speechflow_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
    # multi-host entry (reference DDP launch, helpers.py:154-188): env-driven
    # jax.distributed init makes jax.devices() the global device list; a
    # single-process run without SPEECHFLOW_COORDINATOR is unaffected
    from speechflow_tpu.parallel.distributed import init_distributed

    rank, world = init_distributed()
    if world > 1:
        LOGGER.info("multi-host training: rank %d of %d", rank, world)
    model_cfg = Config.create_from_file(args.model_config, value_select=args.value_select)
    data_cfg = Config.create_from_file(args.data_config, value_select=args.value_select)
    if args.data_root:
        data_cfg.set_path("dirs.data_root", args.data_root)
    if args.max_steps:
        model_cfg.set_path("trainer.max_steps", args.max_steps)

    if getattr(args, "resume_from", None):
        model_cfg.set_path("resume.from", args.resume_from)
    if getattr(args, "warmstart", None):
        model_cfg.set_path("warmstart.ckpt", args.warmstart)

    exp = model_cfg.section("experiment")
    saver = ExperimentSaver(exp.get("base_dir", "experiments"),
                            expr_suffix=exp.get("name", "run"))
    saver.save_configs(data_cfg_text=data_cfg.to_yaml(),
                       model_cfg_text=model_cfg.to_yaml())
    return model_cfg, data_cfg, saver


def _resume_singletons(model_cfg: Config) -> tp.Optional[dict]:
    """Singleton state from the source checkpoint when resuming/finetuning/
    warmstarting — keeps speaker/lang id maps stable across runs (reference:
    SpeakerIDSetter.resume_from_checkpoint, config_prepare.py:241-268)."""
    src = (model_cfg.get_path("resume.from")
           or model_cfg.get_path("finetune.ckpt")
           or model_cfg.get_path("warmstart.ckpt"))
    if not src:
        return None
    from pathlib import Path

    p = Path(str(src))
    ckpt = p if (p / "_CHECKPOINT_METADATA").exists() or (p / "model").exists()         else ExperimentSaver.get_last_checkpoint(p)
    if ckpt is None:
        return None
    try:
        _, payload = ExperimentSaver.load_checkpoint(ckpt)
        return (payload.get("pipeline_info") or {}).get("singletons")
    except Exception:  # noqa: BLE001 — resume still works without seeding
        LOGGER.warning("could not read singleton state from %s", ckpt)
        return None


def build_data(data_cfg: Config, model_cfg: Config) -> tp.Tuple[DataPipeline, LoaderBundle]:
    import jax

    dl_cfg = model_cfg.section("data_loaders")
    global_bs = int(model_cfg.get_path("batch.size", 8))
    if jax.process_count() > 1:
        # rank0 hosts the DataServer for all ranks; the configured batch size
        # is the GLOBAL batch — each rank's loader pulls its 1/world share
        from speechflow_tpu.server import init_data_loader_distributed

        local_bs = max(global_bs // jax.process_count(), 1)
        pipeline = None
        if jax.process_index() == 0:
            pipeline = DataPipeline(data_cfg).init_components(
                seed_singletons=_resume_singletons(model_cfg))
        bundle = init_data_loader_distributed(
            pipeline=pipeline,
            batch_size=local_bs,
            n_workers=int(dl_cfg.get("n_workers", 2)),
            prefetch_factor=int(dl_cfg.get("prefetch_factor", 8)),
        )
        if pipeline is None:
            # non-root ranks rebuild pipeline metadata (alphabet, singleton
            # state) from the server's info blob for model_config_from_info
            from speechflow_tpu.server.client import DataClient

            with DataClient(bundle.loaders[next(iter(bundle.loaders))].server_addr) as c:
                pipeline = DataPipeline.from_info(c.info)
        return pipeline, bundle

    pipeline = DataPipeline(data_cfg).init_components(
        seed_singletons=_resume_singletons(model_cfg))
    bundle = init_data_loader(
        pipeline=pipeline,
        batch_size=global_bs,
        n_workers=int(dl_cfg.get("n_workers", 2)),
        prefetch_factor=int(dl_cfg.get("prefetch_factor", 8)),
    )
    return pipeline, bundle


def model_config_from_info(model_cfg: Config, pipeline: DataPipeline) -> dict:
    """Inject dataset-derived dimensions into the model params dict."""
    info = pipeline.get_info()
    m = model_cfg.section("model").to_dict()
    if pipeline.alphabet is not None:
        m["n_symbols"] = len(pipeline.alphabet)
    spk = info["singletons"].get("SpeakerIDSetter", {})
    m["n_speakers"] = max(len(spk.get("speaker2id", {})), 1)
    m["n_langs"] = max(len(spk.get("lang2id", {})), 1)
    mel_cfg = Config(info["config"]).get_path("preproc.pipe_cfg.linear_to_mel.n_mels")
    if mel_cfg:
        m["n_mels"] = int(mel_cfg)
    return m


def trainer_config(model_cfg: Config) -> TrainerConfig:
    t = model_cfg.section("trainer").to_dict()
    known = {"max_steps", "log_every", "val_every", "ckpt_every", "val_batches", "seed"}
    kwargs = {k: int(v) for k, v in t.items() if k in known}
    for flag in ("use_mesh", "mixed_precision"):
        if flag in t:
            kwargs[flag] = bool(t[flag])
    return TrainerConfig(**kwargs)


def optimizer_config(model_cfg: Config) -> OptimizerConfig:
    return OptimizerConfig.from_config(model_cfg.section("optimizer").to_dict())


def apply_resume_warmstart(trainer, model_cfg: Config) -> None:
    """Resume / finetune / warmstart wiring (reference: config_prepare.py:46-56,
    179-206 + finetuning.py:18,66):

    - ``resume.from`` (set from the -r CLI flag): load the experiment's last
      checkpoint — weights, optimizer state and global step.
    - ``finetune.ckpt``: load model weights only (fresh optimizer/step).
    - ``warmstart.ckpt`` (+ include/exclude prefix lists): load a filtered
      subset of weights into the freshly initialized model.
    """
    import jax
    from flax import nnx

    from speechflow_tpu.training.saver import ExperimentSaver

    resume_from = model_cfg.get_path("resume.from")
    if resume_from:
        ckpt = ExperimentSaver.get_last_checkpoint(resume_from)
        if ckpt is None:
            raise FileNotFoundError(f"no checkpoint under {resume_from}")
        trainer.load_checkpoint(ckpt)
        LOGGER.info("resumed from %s at step %d", ckpt, trainer.global_step)
        return

    ft = model_cfg.get_path("finetune.ckpt")
    ws = model_cfg.get_path("warmstart.ckpt")
    if not ft and not ws:
        return
    tree, _ = ExperimentSaver.load_checkpoint(ft or ws)
    source = tree["model"]
    if ws:
        source = ExperimentSaver.filter_state_by_prefix(
            source,
            include=model_cfg.get_path("warmstart.include", []) or [],
            exclude=model_cfg.get_path("warmstart.exclude", []) or [],
        )
    state = nnx.state(trainer.model, nnx.Not(nnx.RngState))
    current = nnx.to_pure_dict(state)
    merged = ExperimentSaver.merge_states(current, source)
    nnx.replace_by_pure_dict(state, merged)
    nnx.update(trainer.model, state)
    LOGGER.info("%s weights loaded from %s", "warmstart" if ws else "finetune", ft or ws)
