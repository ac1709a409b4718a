"""TTS criterion: dispatches the configured losses over model outputs.

Capability parity with the reference TTSLoss
(tts/acoustic_models/criterion.py:18): spectral losses over the stacked
per-stage spectrograms, gate BCE, per-variance regression (durations in
log(1+d) domain), plus pass-through of the model's additional losses (CFM,
VAE KL, VQ, inverse-speaker CE via gradient reversal) with per-loss iteration
scheduling from the loss zoo.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import optax

from speechflow_tpu.models.tts.data_types import TTSOutput, TTSTarget
from speechflow_tpu.training.losses import (
    GateLoss,
    LossSchedule,
    RegressionLoss,
    SpectralLoss,
)

__all__ = ["TTSCriterion"]


class TTSCriterion:
    def __init__(
        self,
        spectral_kind: str = "l1",
        spectral_scale: float = 1.0,
        gate_scale: float = 1.0,
        variance_scales: tp.Optional[tp.Dict[str, float]] = None,
        additional_scales: tp.Optional[tp.Dict[str, float]] = None,
        inverse_speaker_scale: float = 0.0,
        schedules: tp.Optional[tp.Dict[str, LossSchedule]] = None,
    ):
        schedules = schedules or {}
        self.spectral = SpectralLoss(kind=spectral_kind, name="spectral",
                                     schedule=schedules.get("spectral", LossSchedule(scale=spectral_scale)))
        self.gate = GateLoss(name="gate", schedule=schedules.get("gate", LossSchedule(scale=gate_scale)))
        self.variance_scales = variance_scales or {
            "durations": 0.1, "aggregate_pitch": 0.1, "aggregate_energy": 0.1}
        self.regression = RegressionLoss(kind="l2")
        self.additional_scales = additional_scales or {}
        self.inverse_speaker_scale = inverse_speaker_scale

    def __call__(self, outputs: TTSOutput, targets: TTSTarget,
                 step: jnp.ndarray) -> tp.Dict[str, jnp.ndarray]:
        losses: tp.Dict[str, jnp.ndarray] = {}
        lens = targets.mel_lengths

        if outputs.spectrogram is not None and targets.mel is not None:
            losses["spectral"] = self.spectral(outputs.spectrogram, targets.mel,
                                               step=step, lengths=lens)

        if outputs.gate is not None and targets.gate is not None:
            losses["gate"] = self.gate(outputs.gate, targets.gate, step=step, lengths=lens)

        preds = outputs.variance_predictions or {}
        tok_lens = targets.transcription_lengths
        for name, scale in self.variance_scales.items():
            if name not in preds:
                continue
            target = getattr(targets, name, None)
            if target is None:
                continue
            if name == "durations":
                target = jnp.log1p(jnp.maximum(target, 0.0))  # predictor is log(1+d)
            losses[name] = scale * self.regression(preds[name], target, lengths=tok_lens)

        for name, val in (outputs.additional_losses or {}).items():
            losses[name] = self.additional_scales.get(name, 1.0) * val

        extra = outputs.additional_content or {}
        if self.inverse_speaker_scale > 0 and "inverse_speaker_logits" in extra \
                and targets.speaker_id is not None:
            ce = optax.softmax_cross_entropy_with_integer_labels(
                extra["inverse_speaker_logits"], jnp.maximum(targets.speaker_id, 0))
            losses["inverse_speaker"] = self.inverse_speaker_scale * jnp.mean(ce)

        return losses
