from speechflow_tpu.training.losses.base import BaseLoss, LossSchedule
from speechflow_tpu.training.losses.zoo import (
    SpectralLoss,
    GateLoss,
    RegressionLoss,
    VAELoss,
    MLELoss,
    GuidedAttentionLoss,
    InverseSpeakerLoss,
    DurationLoss,
    SoftDTWLoss,
    DiffSpectralLoss,
    SSIMLoss,
    CTCLoss,
    LOSSES,
    build_loss,
)

__all__ = [
    "BaseLoss", "LossSchedule",
    "SpectralLoss", "GateLoss", "RegressionLoss", "VAELoss", "MLELoss",
    "GuidedAttentionLoss", "InverseSpeakerLoss", "DurationLoss", "SoftDTWLoss",
    "DiffSpectralLoss", "SSIMLoss", "CTCLoss",
    "LOSSES", "build_loss",
]
