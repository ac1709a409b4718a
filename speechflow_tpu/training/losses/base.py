"""Loss base with iteration scheduling.

Capability parity with the reference BaseLoss
(speechflow/training/base_loss.py:22): every loss carries a schedule
(begin_iter/end_iter/every_iter/scale, optional linear anneal) evaluated
*inside* jit from the global step, so loss gating never causes retraces.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax.numpy as jnp

__all__ = ["LossSchedule", "BaseLoss"]


@dataclasses.dataclass
class LossSchedule:
    scale: float = 1.0
    begin_iter: int = 0
    end_iter: tp.Optional[int] = None
    every_iter: int = 1
    anneal_iters: int = 0  # linear ramp from begin_iter

    def gate(self, step: jnp.ndarray) -> jnp.ndarray:
        on = (step >= self.begin_iter).astype(jnp.float32)
        if self.end_iter is not None:
            on = on * (step < self.end_iter).astype(jnp.float32)
        if self.every_iter > 1:
            on = on * ((step % self.every_iter) == 0).astype(jnp.float32)
        scale = jnp.asarray(self.scale, jnp.float32)
        if self.anneal_iters > 0:
            ramp = jnp.clip((step - self.begin_iter) / self.anneal_iters, 0.0, 1.0)
            scale = scale * ramp
        return on * scale


class BaseLoss:
    def __init__(self, name: str = "", schedule: tp.Optional[LossSchedule] = None, **kwargs):
        self.name = name or type(self).__name__
        self.schedule = schedule or LossSchedule(**{
            k: v for k, v in kwargs.items()
            if k in ("scale", "begin_iter", "end_iter", "every_iter", "anneal_iters")
        })

    def compute(self, output, target, **kwargs) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(self, output, target=None, step: jnp.ndarray = None, **kwargs) -> jnp.ndarray:
        val = self.compute(output, target, **kwargs)
        if step is None:
            return val * self.schedule.scale
        return val * self.schedule.gate(step)
