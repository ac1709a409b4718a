"""Optimizer construction with parameter-group iteration windows.

Capability parity with the reference Optimizer
(speechflow/training/optimizer.py:20,133): named parameter groups (matched by
path prefix/substring) can be enabled only inside an iteration window
[begin_iter, end_iter) with their own LR scale — realized the JAX way as
``optax.multi_transform`` over path-based labels plus a step-gated mask, so
the schedule lives *inside* the jit'd update (no python-side param-group
mutation per step).
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import optax

from speechflow_tpu.training.lr_schedulers import build_lr_schedule

__all__ = ["OptimizerConfig", "ParamGroup", "build_optimizer"]


@dataclasses.dataclass
class ParamGroup:
    pattern: str                      # substring matched against the param path
    lr_scale: float = 1.0
    begin_iter: int = 0
    end_iter: tp.Optional[int] = None # None = forever


@dataclasses.dataclass
class OptimizerConfig:
    method: str = "adamw"             # adam | adamw | sgd | lamb | adafactor
    lr: float = 1e-4
    lr_schedule: str = "ConstLR"
    lr_schedule_kwargs: tp.Dict[str, tp.Any] = dataclasses.field(default_factory=dict)
    weight_decay: float = 1e-6
    betas: tp.Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    grad_clip: tp.Optional[float] = 1.0
    grad_accum: int = 1               # micro-batches per optimizer step (reference: accumulate_grad_batches, mel_bigvgan.yml:26)
    param_groups: tp.List[ParamGroup] = dataclasses.field(default_factory=list)

    @staticmethod
    def from_config(cfg: tp.Mapping) -> "OptimizerConfig":
        cfg = dict(cfg)
        groups = [ParamGroup(**g) for g in cfg.pop("param_groups", [])]
        known = {f.name for f in dataclasses.fields(OptimizerConfig)}
        return OptimizerConfig(**{k: v for k, v in cfg.items() if k in known},
                               param_groups=groups)


def _base_tx(cfg: OptimizerConfig, schedule) -> optax.GradientTransformation:
    if cfg.method == "adamw":
        return optax.adamw(schedule, b1=cfg.betas[0], b2=cfg.betas[1],
                           eps=cfg.eps, weight_decay=cfg.weight_decay)
    if cfg.method == "adam":
        return optax.adam(schedule, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)
    if cfg.method == "sgd":
        return optax.sgd(schedule, momentum=cfg.betas[0])
    if cfg.method == "lamb":
        return optax.lamb(schedule, b1=cfg.betas[0], b2=cfg.betas[1],
                          eps=cfg.eps, weight_decay=cfg.weight_decay)
    if cfg.method == "adafactor":
        return optax.adafactor(schedule)
    raise ValueError(f"unknown optimizer method: {cfg.method}")


def _path_str(path: tp.Tuple) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "name", getattr(p, "idx", p)))
        parts.append(str(key))
    return "/".join(parts)


def build_optimizer(cfg: OptimizerConfig,
                    params_example: tp.Optional[tp.Any] = None
                    ) -> optax.GradientTransformation:
    """Build the gradient transformation; param groups need ``params_example``
    (a pytree with the same structure as the grads) for path labeling."""
    schedule = build_lr_schedule(cfg.lr_schedule, cfg.lr, **cfg.lr_schedule_kwargs)
    tx = _base_tx(cfg, schedule)

    if cfg.param_groups:
        groups = list(cfg.param_groups)

        def group_for(path_str: str) -> tp.Optional[ParamGroup]:
            for g in groups:
                if g.pattern in path_str:
                    return g
            return None

        def gate_updates() -> optax.GradientTransformation:
            """Per-leaf (scale × step-window) gating inside the jit'd update.

            Group membership is resolved from the update tree's own paths at
            trace time (static), so this works with any grad pytree structure
            (nnx State, pure dict, ...) without a parallel label tree.
            Applied AFTER the base optimizer so the scale acts on *updates*
            (Adam-family methods are invariant to gradient scale) and a
            disabled window fully freezes params — including AdamW weight
            decay, which lives in the base updates.
            """

            def init(params):
                return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

            def update(updates, state, params=None):
                step = state.count

                def gate_leaf(path, u):
                    g = group_for(_path_str(path))
                    if g is None:
                        return u
                    on = (step >= g.begin_iter).astype(jnp.float32)
                    if g.end_iter is not None:
                        on = on * (step < g.end_iter).astype(jnp.float32)
                    return u * on * g.lr_scale

                updates = jax.tree_util.tree_map_with_path(gate_leaf, updates)
                return updates, optax.ScaleByScheduleState(count=step + 1)

            return optax.GradientTransformation(init, update)

        tx = optax.chain(tx, gate_updates())

    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    # NaN guard: reject non-finite updates entirely (reference detect_grad_nan,
    # lightning_engine.py:149 zeroes grads on inf/nan)
    tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    if cfg.grad_accum > 1:
        # accumulate raw grads over k micro-batches; the inner chain (clip,
        # base step, windows, NaN guard) runs once per true optimizer step
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx
