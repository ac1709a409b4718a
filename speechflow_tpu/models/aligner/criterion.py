"""Aligner losses (reference: tts/forced_alignment/criterion.py:16 GlowTTSLoss):
flow MLE under the hard MAS alignment + log-domain duration regression."""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp

from speechflow_tpu.utils.masks import sequence_mask

__all__ = ["AlignerCriterion"]


class AlignerCriterion:
    def __init__(self, duration_scale: float = 1.0):
        self.duration_scale = duration_scale

    def __call__(self, outputs: dict, targets, step) -> tp.Dict[str, jnp.ndarray]:
        z, logdet = outputs["z"], outputs["logdet"]
        mu_t, logstd_t = outputs["mu_t"], outputs["logstd_t"]
        lens = outputs["mel_lengths"]
        mask = sequence_mask(lens, z.shape[1])[..., None].astype(z.dtype)

        denom = jnp.maximum(jnp.sum(mask) * z.shape[-1], 1.0)
        nll = jnp.sum((0.5 * jnp.exp(-2 * logstd_t) * (z - mu_t) ** 2 + logstd_t) * mask)
        mle = (nll - jnp.sum(logdet)) / denom + 0.5 * jnp.log(2 * jnp.pi)

        # duration loss in log(1+d) domain against MAS durations
        tok_mask = sequence_mask(targets.transcription_lengths,
                                 outputs["durations"].shape[1]).astype(z.dtype)
        d_target = jnp.log1p(outputs["durations"])
        d_err = ((outputs["log_dur_pred"] - d_target) ** 2) * tok_mask
        dur = jnp.sum(d_err) / jnp.maximum(jnp.sum(tok_mask), 1.0)

        return {"mle": mle, "duration": self.duration_scale * dur}
