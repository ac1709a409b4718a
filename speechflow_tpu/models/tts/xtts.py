"""XTTS-style model: GPT language model over neural-codec acoustic tokens.

Capability parity with the reference XTTSDecoder assembly
(tts/acoustic_models/modules/components/decoders/xtts_decoder.py:34 +
common/gpts/gpt_acoustic.py GPTA over DAC tokens): the acoustic "decoder" is
a causal transformer (attention or RetNet retention blocks) predicting codec
codes from text tokens (+ speaker condition); synthesis samples codes and
decodes them with the neural codec. Training computes codec codes on device
from the target waveform inside the same step (no precompute required, though
the dump cache path also works via embeddings.codec_features).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from speechflow_tpu.models.tts.ar_decoders import GPTDecoder
from speechflow_tpu.training.base_model import BaseModelParams

__all__ = ["XTTSParams", "XTTSModel", "XTTSBatchProcessor", "xtts_criterion"]


class XTTSParams(BaseModelParams):
    n_symbols: int = 256
    n_speakers: int = 1
    dim: int = 512
    n_layers: int = 8
    n_heads: int = 8
    block_type: str = "attention"      # attention | retention
    speaker_emb_dim: int = 128
    codec: dict = {}
    freeze_codec: bool = True          # codec trained separately; GPT on top


class XTTSModel(nnx.Module):
    def __init__(self, params: XTTSParams, rngs: tp.Optional[nnx.Rngs] = None):
        # local import: codec/rvq.py imports tts.common, so a module-scope
        # import here would be circular through the tts package __init__
        from speechflow_tpu.models.codec import CodecParams, NeuralCodec

        rngs = rngs or nnx.Rngs(0)
        self.p = params
        self.codec = NeuralCodec(CodecParams.create(params.codec), rngs=rngs)
        self.n_codes = self.codec.p.codebook_size
        # +2 for BOS/EOS in the GPT's audio vocabulary
        self.gpt = GPTDecoder(
            n_text_tokens=params.n_symbols,
            n_audio_tokens=self.n_codes + 2,
            dim=params.dim, n_layers=params.n_layers, n_heads=params.n_heads,
            block_type=params.block_type,
            cond_dim=params.speaker_emb_dim, rngs=rngs)
        self.speaker_emb = nnx.Embed(params.n_speakers, params.speaker_emb_dim, rngs=rngs)

    def _cond(self, inputs):
        sid = inputs.speaker_id if not isinstance(inputs, dict) else inputs.get("speaker_id")
        return None if sid is None else self.speaker_emb(jnp.maximum(sid, 0))

    def __call__(self, inputs, training: bool = True) -> tp.Dict[str, jnp.ndarray]:
        """inputs: mapping (or TTSForwardInput) with 'transcription',
        'waveform' (+ optional 'waveform_lengths', 'speaker_id').
        Returns the teacher-forced GPT cross-entropy loss dict."""
        wav = inputs["waveform"] if isinstance(inputs, dict) else inputs.get("waveform")
        text = inputs["transcription"] if isinstance(inputs, dict) else inputs.transcription
        codes = self.codec.encode(wav)[..., 0]  # first quantizer stream
        if self.p.freeze_codec:
            codes = jax.lax.stop_gradient(codes)
        lens = jnp.full((codes.shape[0],), codes.shape[1], jnp.int32)
        wl = inputs.get("waveform_lengths") if isinstance(inputs, dict) else None
        if wl is not None:
            lens = jnp.maximum(wl // self.codec.hop, 1)
        loss = self.gpt.loss(text, codes.astype(jnp.int32), lens, self._cond(inputs))
        return {"gpt_ce": loss}

    def synthesize(self, text_ids: jnp.ndarray,
                   speaker_id: tp.Optional[jnp.ndarray] = None,
                   max_tokens: int = 256, temperature: float = 0.8,
                   key=None) -> jnp.ndarray:
        cond = None if speaker_id is None else self.speaker_emb(jnp.maximum(speaker_id, 0))
        codes = self.gpt.generate(text_ids, max_tokens=max_tokens,
                                  temperature=temperature, key=key, cond=cond)
        codes = jnp.clip(codes, 0, self.n_codes - 1)
        return self.codec.decode(codes[..., None])


class XTTSBatchProcessor:
    """Collated TTS batch -> ({'transcription', 'waveform', ...}, {}) for the
    XTTS GPT (reference: the GPTA training path consumes text tokens + codec
    codes computed from the target waveform)."""

    def __call__(self, batch):
        from speechflow_tpu.data.core.batch import Batch

        c = batch.collated_samples if isinstance(batch, Batch) else batch
        get = (lambda k: c.get(k)) if isinstance(c, dict) else (lambda k: getattr(c, k, None))
        inputs = {
            "transcription": get("transcription"),
            "waveform": get("waveform"),
            "waveform_lengths": get("waveform_lengths"),
            "speaker_id": get("speaker_id"),
        }
        return inputs, {}


def xtts_criterion():
    """XTTSModel returns its loss dict directly; pass it through."""

    def criterion(outputs, targets, step):
        return outputs

    return criterion
