"""GAN trainer: alternating generator/discriminator optimization.

Capability parity with the reference GANLightningEngine(WithManualOptimization)
(speechflow/training/lightning_engine.py:176,322) and the vocoder engine
(tts/vocoders/vocos/lightning_engine.py:36): two optimizers, per-step
alternation with configurable discriminator frequency, grad clipping and NaN
rejection via the optimizer chain, checkpointing both states. The two
sub-steps are two jit programs; generator losses receive the discriminator
module (frozen within the generator step via lax.stop_gradient on its outputs
being the discriminator's responsibility — the criterion contract matches the
reference: gen_criterion(gen_out, disc, inputs, targets, step)).
"""

from __future__ import annotations

import dataclasses
import logging
import time
import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.training.optimizer import OptimizerConfig, build_optimizer
from speechflow_tpu.training.saver import ExperimentSaver
from speechflow_tpu.training.trainer import TrainerConfig, _cast_floats, _sum_losses

LOGGER = logging.getLogger("speechflow_tpu")

__all__ = ["GANTrainer"]


class GANTrainer:
    def __init__(
        self,
        generator: nnx.Module,
        discriminator: nnx.Module,
        gen_criterion: tp.Callable,   # (gen_out, disc, inputs, targets, step) -> {name: loss}
        disc_criterion: tp.Callable,  # (gen_out, disc, inputs, targets, step) -> {name: loss}
        batch_processor: tp.Callable,
        gen_optimizer: tp.Optional[OptimizerConfig] = None,
        disc_optimizer: tp.Optional[OptimizerConfig] = None,
        config: tp.Optional[TrainerConfig] = None,
        saver: tp.Optional[ExperimentSaver] = None,
        disc_every: int = 1,
        disc_start_iter: int = 0,
        tb_dir: tp.Optional[tp.Union[str, Path]] = None,
        mos_hook: tp.Optional[tp.Callable] = None,
        evaluate_pesq: bool = False,
    ):
        self.mos_hook = mos_hook
        # reference: vocos/lightning_engine.py:69 `evaluate_pesq` — wideband
        # PESQ at 16 kHz on each validation batch (models/vocoder/pesq.py)
        self.evaluate_pesq = evaluate_pesq
        self.generator = generator
        self.discriminator = discriminator
        self.batch_processor = batch_processor
        self.cfg = config or TrainerConfig()
        self.disc_every = disc_every
        self.disc_start_iter = disc_start_iter
        self.saver = saver
        self.global_step = 0
        from speechflow_tpu.parallel.mesh import make_mesh

        self.mesh = make_mesh() if self.cfg.use_mesh else None

        g_cfg = gen_optimizer or OptimizerConfig(method="adamw", lr=2e-4)
        d_cfg = disc_optimizer or OptimizerConfig(method="adamw", lr=2e-4)
        self.gen_opt = nnx.Optimizer(generator, build_optimizer(g_cfg), wrt=nnx.Param)
        self.disc_opt = nnx.Optimizer(discriminator, build_optimizer(d_cfg), wrt=nnx.Param)

        self._tb = None
        if tb_dir is not None:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(str(tb_dir))

        if self.cfg.mixed_precision:
            from speechflow_tpu.training.trainer import set_compute_dtype

            n = set_compute_dtype(generator) + set_compute_dtype(discriminator)
            LOGGER.info("mixed precision: bf16 compute on %d modules (fp32 master weights)", n)

        @nnx.jit
        def _gen_step(gen, disc, gen_opt, inputs, targets, step):
            def loss_fn(g):
                out = _cast_floats(g(inputs), jnp.float32)
                losses = gen_criterion(out, disc, inputs, targets, step)
                return _sum_losses(losses), (losses, out)

            (total, (losses, out)), grads = nnx.value_and_grad(loss_fn, has_aux=True)(gen)
            gen_opt.update(gen, grads)
            return total, losses, out

        @nnx.jit
        def _disc_step(gen_out, gen, disc, disc_opt, inputs, targets, step):
            def loss_fn(d):
                losses = disc_criterion(jax.lax.stop_gradient(gen_out), d, inputs, targets, step)
                return _sum_losses(losses), losses

            (total, losses), grads = nnx.value_and_grad(loss_fn, has_aux=True)(disc)
            disc_opt.update(disc, grads)
            return total, losses

        @nnx.jit
        def _val_fwd(gen, inputs):
            # validation must run jitted: eager complex math (ISTFT heads)
            # is UNIMPLEMENTED on the TPU backend outside XLA
            return gen(inputs)

        self._gen_step = _gen_step
        self._disc_step = _disc_step
        self._val_fwd = _val_fwd

    def _place(self, tree):
        if self.mesh is not None:
            from speechflow_tpu.parallel.mesh import shard_batch

            return shard_batch(tree, self.mesh)
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)

    def training_step(self, batch) -> tp.Dict[str, jnp.ndarray]:
        """One gen (+disc) step; returns {name: lazy 0-d device scalar} —
        see Trainer.training_step for the fetch contract."""
        inputs, targets = self.batch_processor(batch)
        inputs, targets = self._place(inputs), self._place(targets)
        step = jnp.asarray(self.global_step, jnp.int32)

        g_total, g_losses, gen_out = self._gen_step(
            self.generator, self.discriminator, self.gen_opt, inputs, targets, step)
        # device scalars, fetched lazily (see Trainer.training_step): the GAN
        # step is the most expensive program in the framework and a per-step
        # host sync would stall the dispatch pipeline
        metrics = {f"gen/{k}": v for k, v in g_losses.items()}
        metrics["gen/total"] = g_total

        if (self.global_step >= self.disc_start_iter
                and self.global_step % self.disc_every == 0):
            d_total, d_losses = self._disc_step(
                gen_out, self.generator, self.discriminator, self.disc_opt,
                inputs, targets, step)
            metrics.update({f"disc/{k}": v for k, v in d_losses.items()})
            metrics["disc/total"] = d_total

        self.global_step += 1
        return metrics

    def validation_step(self, batch) -> tp.Dict[str, float]:
        """Objective audio-quality metrics on one val batch: MCD, periodicity
        (F0 RMSE + voiced F1) and SI-SNR between generated and real waveforms
        (reference: vocos/metrics/* UTMOS/PESQ-class validation — offline the
        framework reports its own host metrics + the optional MOSHook)."""
        from speechflow_tpu.models.vocoder.metrics import (
            mel_cepstral_distortion,
            periodicity_metrics,
            si_snr,
        )

        inputs, targets = self.batch_processor(batch)
        inputs, targets = self._place(inputs), self._place(targets)
        out = self._val_fwd(self.generator, inputs)
        if isinstance(out, tuple):
            out = out[0]
        fake = np.asarray(out, np.float32)
        real = np.asarray(targets["waveform"], np.float32)
        t = min(fake.shape[-1], real.shape[-1])
        fake, real = fake[..., :t], real[..., :t]
        sr = getattr(getattr(self.generator, "params", None), "sample_rate", 24000)
        pm = periodicity_metrics(fake, real, sr)
        metrics = {"val/mcd": mel_cepstral_distortion(fake, real, sr),
                   "val/si_snr": si_snr(fake, real)}
        metrics.update({f"val/{k}": float(v) for k, v in pm.items()})
        if self.evaluate_pesq:
            from speechflow_tpu.models.vocoder.pesq import pesq_wb

            metrics["val/pesq_wb"] = float(np.mean(
                [pesq_wb(r, f, sr) for r, f in zip(real, fake)]))
        if self.mos_hook is not None:
            mos = [self.mos_hook(f, sr) for f in fake]
            mos = [m for m in mos if m is not None]
            if mos:
                metrics["val/mos"] = float(np.mean(mos))
        return metrics

    def warmstart_discriminator(self, expr_or_ckpt) -> None:
        """Load only the discriminator weights from another experiment
        (reference vocoder recipes warm-start the discriminator from a
        pretrained GAN run, e.g. styletts2_bigvgan_ft.yml)."""
        ckpt = ExperimentSaver.get_last_checkpoint(expr_or_ckpt)
        if ckpt is None:
            raise FileNotFoundError(f"no checkpoint under {expr_or_ckpt}")
        tree, _ = ExperimentSaver.load_checkpoint(ckpt)
        state = nnx.state(self.discriminator, nnx.Not(nnx.RngState))
        nnx.replace_by_pure_dict(state, tree["model"]["discriminator"])
        nnx.update(self.discriminator, state)
        LOGGER.info("warm-started discriminator from %s", ckpt)

    def validate(self, val_loader) -> tp.Dict[str, float]:
        get_next = (val_loader.next_batch if hasattr(val_loader, "next_batch")
                    else iter(val_loader).__next__)
        agg: tp.Dict[str, list] = {}
        for _ in range(self.cfg.val_batches):
            try:
                m = self.validation_step(get_next())
            except (StopIteration, TimeoutError):
                break  # exhausted or starved val loader must not kill training
            for k, v in m.items():
                agg.setdefault(k, []).append(v)
        return {k: float(np.mean(v)) for k, v in agg.items()}

    def fit(self, train_loader, val_loader=None,
            callbacks: tp.Sequence[tp.Callable] = ()) -> tp.Dict[str, float]:
        get_next = train_loader.next_batch if hasattr(train_loader, "next_batch") else iter(train_loader).__next__
        last = {}
        t0 = time.time()
        while self.global_step < self.cfg.max_steps:
            last = self.training_step(get_next())
            s = self.global_step
            for cb in callbacks:
                # same contract as Trainer.fit: cb(self, last) with lazy
                # device-scalar values — callbacks opt into the sync
                cb(self, last)
            if s % self.cfg.log_every == 0:
                LOGGER.info("gan step %d: %s (%.2f it/s)", s,
                            {k: round(float(v), 4) for k, v in last.items()},
                            s / max(time.time() - t0, 1e-9))
                if self._tb:
                    for k, v in last.items():
                        self._tb.add_scalar(k, float(v), s)
            if val_loader is not None and s % self.cfg.val_every == 0:
                vm = self.validate(val_loader)
                LOGGER.info("gan val @ %d: %s", s,
                            {k: round(v, 4) for k, v in vm.items()})
                if self._tb:
                    for k, v in vm.items():
                        self._tb.add_scalar(k, v, s)
                last.update(vm)
            if self.saver is not None and s % self.cfg.ckpt_every == 0:
                self.save_checkpoint()
        if self.saver is not None:
            self.save_checkpoint()
        # force lazy device scalars at the API boundary (see Trainer.fit)
        return {k: float(v) for k, v in last.items()}

    def save_checkpoint(self, extra: tp.Optional[dict] = None):
        if self.saver is None:
            return None
        state = {
            "generator": nnx.to_pure_dict(nnx.state(self.generator, nnx.Not(nnx.RngState))),
            "discriminator": nnx.to_pure_dict(nnx.state(self.discriminator, nnx.Not(nnx.RngState))),
        }
        opt_state = {
            "gen_opt": nnx.to_pure_dict(nnx.state(self.gen_opt, nnx.Not(nnx.RngState))),
            "disc_opt": nnx.to_pure_dict(nnx.state(self.disc_opt, nnx.Not(nnx.RngState))),
        }
        return self.saver.save(self.global_step, state, opt_state, extra=extra)

    def load_checkpoint(self, path) -> dict:
        tree, payload = ExperimentSaver.load_checkpoint(path)
        for mod, key in ((self.generator, "generator"), (self.discriminator, "discriminator")):
            state = nnx.state(mod, nnx.Not(nnx.RngState))
            nnx.replace_by_pure_dict(state, tree["model"][key])
            nnx.update(mod, state)
        # restore both optimizers too — resuming a GAN run must not reset the
        # Adam moments/step counts (mirrors Trainer.load_checkpoint)
        opt_tree = tree.get("opt") or {}
        for opt, key in ((self.gen_opt, "gen_opt"), (self.disc_opt, "disc_opt")):
            if key in opt_tree:
                state = nnx.state(opt, nnx.Not(nnx.RngState))
                nnx.replace_by_pure_dict(state, opt_tree[key])
                nnx.update(opt, state)
        self.global_step = int(tree.get("step", 0))
        return payload
