"""Trainer: the jit/pjit training loop replacing Lightning.

Capability parity with the reference LightningEngine
(speechflow/training/lightning_engine.py:24): batch_processor(batch) ->
(inputs, targets); model(inputs); criterion(outputs, targets, step) -> dict of
named losses summed (names containing 'constant' are logged but not summed);
NaN guard (optax.apply_if_finite in the optimizer rejects non-finite updates);
periodic validation, TensorBoard metrics, checkpointing via ExperimentSaver.

TPU-first: the whole step is one nnx.jit program; multi-chip data parallelism
is the same step with the batch sharded over a Mesh 'data' axis and parameters
replicated (``compile_sharded_step``) — XLA inserts the gradient reductions
over ICI. Losses are computed in float32; model compute may be bfloat16.
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

from speechflow_tpu.parallel.mesh import make_mesh, shard_batch
from speechflow_tpu.training.optimizer import OptimizerConfig, build_optimizer
from speechflow_tpu.training.saver import ExperimentSaver

LOGGER = logging.getLogger("speechflow_tpu")

__all__ = ["Trainer", "TrainerConfig"]


@dataclasses.dataclass
class TrainerConfig:
    max_steps: int = 1000
    log_every: int = 50
    val_every: int = 500
    ckpt_every: int = 1000
    val_batches: int = 8
    use_mesh: bool = False        # shard batches over all local devices
    mixed_precision: bool = False # bf16 compute with fp32 master weights
    seed: int = 0


def _cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree (works on nnx State too)."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def set_compute_dtype(module: nnx.Module, dtype=jnp.bfloat16) -> int:
    """Flax-native mixed precision: set the *compute* dtype on every flax
    primitive (Linear/Conv/Embed/norm/attention...) in the module tree.

    Each layer then casts its inputs and params to ``dtype`` for the
    matmul/conv while ``param_dtype`` — the stored master weights — and the
    optimizer state stay fp32, and gradients come back fp32. This is the
    bf16 training recipe for the TPU MXU. Returns the number of patched
    modules.
    """
    n = 0
    for _, mod in nnx.iter_graph(module):
        if (isinstance(mod, nnx.Module)
                and type(mod).__module__.startswith("flax")
                and hasattr(mod, "dtype")):
            mod.dtype = dtype
            n += 1
    return n


def _sum_losses(losses: tp.Dict[str, jnp.ndarray]) -> jnp.ndarray:
    total = 0.0
    for name, val in losses.items():
        if "constant" in name:
            continue
        total = total + val
    return total


class Trainer:
    def __init__(
        self,
        model: nnx.Module,
        criterion: tp.Callable,          # (outputs, targets, step) -> {name: loss}
        batch_processor: tp.Callable,    # collated -> (inputs, targets)
        optimizer_config: tp.Optional[OptimizerConfig] = None,
        config: tp.Optional[TrainerConfig] = None,
        saver: tp.Optional[ExperimentSaver] = None,
        tb_dir: tp.Optional[tp.Union[str, Path]] = None,
    ):
        self.model = model
        self.criterion = criterion
        self.batch_processor = batch_processor
        self.cfg = config or TrainerConfig()
        self.opt_cfg = optimizer_config or OptimizerConfig()
        self.saver = saver
        self.global_step = 0
        self.mesh = make_mesh() if self.cfg.use_mesh else None

        tx = build_optimizer(self.opt_cfg,
                             nnx.state(model, nnx.Param))
        self.optimizer = nnx.Optimizer(model, tx, wrt=nnx.Param)

        self._tb = None
        if tb_dir is not None:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(str(tb_dir))

        criterion_fn = self.criterion
        if self.cfg.mixed_precision:
            n = set_compute_dtype(model, jnp.bfloat16)
            LOGGER.info("mixed precision: bf16 compute on %d modules (fp32 master weights)", n)

        @nnx.jit
        def _train_step(model, optimizer, inputs, targets, step):
            def loss_fn(m):
                outputs = _cast_floats(m(inputs), jnp.float32)
                losses = criterion_fn(outputs, targets, step)
                return _sum_losses(losses), losses

            (total, losses), grads = nnx.value_and_grad(loss_fn, has_aux=True)(model)
            optimizer.update(model, grads)
            return total, losses

        @nnx.jit
        def _val_step(model, inputs, targets, step):
            outputs = model(inputs)
            losses = criterion_fn(outputs, targets, step)
            return _sum_losses(losses), losses

        self._train_step = _train_step
        self._val_step = _val_step

    # -- step API ---------------------------------------------------------------

    def _place(self, tree):
        if self.mesh is not None:
            return shard_batch(tree, self.mesh)
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)

    def training_step(self, batch) -> tp.Dict[str, jnp.ndarray]:
        """One optimizer step; returns {name: 0-d device scalar}.

        Values are LAZY — call float(v) to fetch (each scalar supports
        float/format/comparison transparently). Anything that needs plain
        floats (json, csv, cross-process reporting) must convert first.
        """
        inputs, targets = self.batch_processor(batch)
        inputs, targets = self._place(inputs), self._place(targets)
        step = jnp.asarray(self.global_step, jnp.int32)
        total, losses = self._train_step(self.model, self.optimizer, inputs, targets, step)
        self.global_step += 1
        # losses stay 0-d device scalars: fetching them here would block the
        # host on every step's device completion, serializing host batch prep
        # with TPU compute.  Consumers (fit's log lines, tests) force the
        # transfer with float() only when they actually read a value.
        out = dict(losses)
        out["total_loss"] = total
        return out

    def validation_step(self, batch) -> tp.Dict[str, float]:
        inputs, targets = self.batch_processor(batch)
        inputs, targets = self._place(inputs), self._place(targets)
        step = jnp.asarray(self.global_step, jnp.int32)
        total, losses = self._val_step(self.model, inputs, targets, step)
        out = {k: float(v) for k, v in losses.items()}
        out["total_loss"] = float(total)
        return out

    # -- loop -----------------------------------------------------------------------

    def fit(self, train_loader, val_loader=None,
            callbacks: tp.Sequence[tp.Callable] = ()) -> tp.Dict[str, float]:
        """train_loader: anything with next_batch() or an iterator of Batch.

        Returns plain-float metrics. Callbacks receive the LAZY per-step dict
        (0-d device scalars — float(v) to fetch); converting there every step
        would block the host on device completion and serialize batch prep
        with TPU compute, so callbacks opt into the sync themselves.
        """
        get_next = self._batch_getter(train_loader)
        last = {}
        t0 = time.time()
        while self.global_step < self.cfg.max_steps:
            batch = get_next()
            last = self.training_step(batch)
            s = self.global_step
            if s % self.cfg.log_every == 0:
                rate = s / max(time.time() - t0, 1e-9)
                LOGGER.info("step %d: %s (%.2f it/s)", s,
                            {k: round(float(v), 4) for k, v in last.items()}, rate)
                self._log_tb("train", last, s)
            if val_loader is not None and s % self.cfg.val_every == 0:
                vm = self.validate(val_loader)
                self._log_tb("val", vm, s)
            if self.saver is not None and s % self.cfg.ckpt_every == 0:
                self.save_checkpoint()
            for cb in callbacks:
                cb(self, last)
        if self.saver is not None:
            self.save_checkpoint()
        # fit's return value escapes the trainer (scripts json/yaml-serialize
        # it, external callers compare floats) — force the device scalars at
        # this API boundary; the per-step laziness above is what matters for
        # throughput
        return {k: float(v) for k, v in last.items()}

    def validate(self, val_loader) -> tp.Dict[str, float]:
        get_next = self._batch_getter(val_loader)
        metrics: tp.Dict[str, list] = {}
        for _ in range(self.cfg.val_batches):
            try:
                m = self.validation_step(get_next())
            except (StopIteration, TimeoutError):
                break  # exhausted or starved val loader must not kill training
            for k, v in m.items():
                metrics.setdefault(k, []).append(v)
        return {k: float(np.mean(v)) for k, v in metrics.items()}

    @staticmethod
    def _batch_getter(loader):
        if hasattr(loader, "next_batch"):
            return loader.next_batch
        it = iter(loader)

        def get():
            return next(it)

        return get

    def _log_tb(self, prefix: str, metrics: tp.Dict[str, float], step: int) -> None:
        if self._tb is None or jax.process_index() != 0:
            return
        for k, v in metrics.items():
            self._tb.add_scalar(f"{prefix}/{k}", float(v), step)

    # -- persistence ----------------------------------------------------------------

    def save_checkpoint(self, extra: tp.Optional[dict] = None) -> tp.Optional[Path]:
        # rank0 writes; params/opt state are replicated so no gather is needed
        if self.saver is None or jax.process_index() != 0:
            return None
        model_state = nnx.to_pure_dict(nnx.state(self.model, nnx.Not(nnx.RngState)))
        opt_state = nnx.to_pure_dict(nnx.state(self.optimizer, nnx.Not(nnx.RngState)))
        return self.saver.save(self.global_step, model_state, opt_state, extra=extra)

    def load_checkpoint(self, path: tp.Union[str, Path]) -> dict:
        tree, payload = ExperimentSaver.load_checkpoint(path)
        state = nnx.state(self.model, nnx.Not(nnx.RngState))
        nnx.replace_by_pure_dict(state, tree["model"])
        nnx.update(self.model, state)
        if "opt" in tree and tree["opt"] is not None:
            opt_state = nnx.state(self.optimizer, nnx.Not(nnx.RngState))
            nnx.replace_by_pure_dict(opt_state, tree["opt"])
            nnx.update(self.optimizer, opt_state)
        self.global_step = int(tree.get("step", 0))
        return payload
