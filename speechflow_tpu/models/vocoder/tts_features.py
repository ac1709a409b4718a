"""E2E TTS+vocoder: the acoustic model as a vocoder feature extractor.

Capability parity with the reference TTSFeatures
(tts/vocoders/vocos/modules/feature_extractors/tts.py:26 and the StyleTTS2
wiring in SURVEY §A.5): a full ParallelTTSModel runs inside the vocoder
generator; its decoder output feeds the backbone/head while its own losses
(spectral vs target mel, variance regressions, CFM/VAE) are returned as
``ft_losses`` and merged into the GAN generator loss — training text->waveform
end to end with one optimizer.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import nnx

from speechflow_tpu.models.tts import ParallelTTSModel, ParallelTTSParams, TTSCriterion
from speechflow_tpu.models.tts.batch_processor import TTSBatchProcessor
from speechflow_tpu.models.tts.data_types import TTSTarget

__all__ = ["TTSFeatures", "e2e_gen_criterion"]


class TTSFeatures(nnx.Module):
    """Feature extractor = acoustic model; exposes the last TTS losses."""

    def __init__(self, tts_params: ParallelTTSParams, rngs: tp.Optional[nnx.Rngs] = None):
        self.tts = ParallelTTSModel(tts_params, rngs=rngs or nnx.Rngs(0))
        self.criterion = TTSCriterion()
        self.dim = tts_params.n_mels

    def __call__(self, inputs) -> tp.Tuple[jnp.ndarray, tp.Dict[str, jnp.ndarray]]:
        """inputs: TTSForwardInput-like mapping; returns (mel_features, ft_losses)."""
        training = inputs.get("_training", True) if isinstance(inputs, dict) else True
        tts_in = inputs["tts_inputs"] if isinstance(inputs, dict) else inputs
        out = self.tts(tts_in, training=training)
        ft_losses = {}
        if training and tts_in.mel is not None:
            targets = TTSTarget(
                mel=tts_in.mel, mel_lengths=tts_in.mel_lengths,
                durations=tts_in.durations,
                aggregate_pitch=tts_in.aggregate_pitch,
                aggregate_energy=tts_in.aggregate_energy,
                transcription_lengths=tts_in.transcription_lengths,
                speaker_id=tts_in.speaker_id,
            )
            ft = self.criterion(out, targets, jnp.asarray(0))
            ft_losses = {f"ft_{k}": v for k, v in ft.items()}
        return out.after_postnet_spectrogram, ft_losses


def e2e_gen_criterion(base_criterion: tp.Callable) -> tp.Callable:
    """Wrap a vocoder gen criterion to merge TTSFeatures' ft_losses
    (reference: vocos/lightning_engine.py:246-252)."""

    def criterion(gen_out, disc, inputs, targets, step):
        wav, ft_losses = gen_out if isinstance(gen_out, tuple) else (gen_out, {})
        losses = base_criterion(wav, disc, inputs, targets, step)
        losses.update(ft_losses)
        return losses

    return criterion
