"""LR schedules (reference: speechflow/training/lr_schedulers.py:11,20,38) as
optax schedule functions: ConstLR, WarmupInvRsqrtLR, WarmupCosine."""

from __future__ import annotations

import typing as tp

import optax

__all__ = ["build_lr_schedule"]


def const_lr(lr: float) -> optax.Schedule:
    return optax.constant_schedule(lr)


def warmup_invrsqrt(lr: float, warmup_steps: int = 4000) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.maximum(step, 1)
        scale = jnp.minimum(step / warmup_steps, (warmup_steps / step) ** 0.5)
        return lr * scale

    return schedule


def warmup_cosine(lr: float, warmup_steps: int = 1000,
                  decay_steps: int = 1_000_000, end_lr_ratio: float = 0.01) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
        decay_steps=decay_steps, end_value=lr * end_lr_ratio,
    )


SCHEDULES: tp.Dict[str, tp.Callable] = {
    "ConstLR": const_lr,
    "WarmupInvRsqrtLR": warmup_invrsqrt,
    "WarmupCosine": warmup_cosine,
}


def build_lr_schedule(name: str = "ConstLR", lr: float = 1e-4, **kwargs) -> optax.Schedule:
    from speechflow_tpu.utils.init import filter_kwargs

    fn = SCHEDULES[name]
    return fn(lr=lr, **filter_kwargs(fn, kwargs))
