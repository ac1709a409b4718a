from speechflow_tpu.models.denoiser.demucs import (
    WaveDenoiser,
    WaveDenoiserParams,
    denoiser_criterion,
)

__all__ = ["WaveDenoiser", "WaveDenoiserParams", "denoiser_criterion"]
