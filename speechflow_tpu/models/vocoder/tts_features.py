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

    def __call__(self, inputs) -> tp.Tuple[jnp.ndarray, tp.Dict[str, jnp.ndarray],
                                           tp.Dict[str, jnp.ndarray]]:
        """inputs: {'tts_inputs': TTSForwardInput, ...} or a TTSForwardInput;
        returns (mel_features, ft_losses, aux). Training mode is decided
        statically by whether teacher mel targets are present (a bool in the
        traced input dict would leak as a tracer).  ``aux`` carries the
        frame-level pitch (token-level variance prediction expanded through
        the length-regulator attention) for NSF heads — the reference
        StyleTTS2 wiring's F0 feed (nsf_hifigan.py:37)."""
        tts_in = inputs["tts_inputs"] if isinstance(inputs, dict) else inputs
        training = tts_in.mel is not None
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
        aux = {}
        tok_pitch = (out.variance_predictions or {}).get("aggregate_pitch")
        if tok_pitch is not None and out.attention is not None:
            aux["pitch"] = jnp.einsum("btn,bn->bt", out.attention, tok_pitch)
        return out.after_postnet_spectrogram, ft_losses, aux


class E2EBatchProcessor:
    """Collated batch -> ({'tts_inputs', 'waveform', ...}, targets) for the
    E2E generator (acoustic model inside the vocoder)."""

    def __init__(self):
        from speechflow_tpu.models.tts.batch_processor import TTSBatchProcessor

        self.tts_bp = TTSBatchProcessor()

    def __call__(self, batch):
        tts_inputs, _ = self.tts_bp(batch)
        from speechflow_tpu.data.core.batch import Batch

        c = batch.collated_samples if isinstance(batch, Batch) else batch
        get = (lambda k: c.get(k)) if isinstance(c, dict) else (lambda k: getattr(c, k, None))
        wav = get("waveform")
        inputs = {"tts_inputs": tts_inputs, "waveform": wav}
        if get("speaker_emb") is not None:
            inputs["speaker_emb"] = get("speaker_emb")
        return inputs, {"waveform": wav}
