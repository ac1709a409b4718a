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
from speechflow_tpu.models.tts.common import TransformerBlock
from speechflow_tpu.training.base_model import BaseModelParams
from speechflow_tpu.utils.masks import sequence_mask

__all__ = ["XTTSParams", "XTTSModel", "XTTSBatchProcessor", "xtts_criterion",
           "PromptEncoder"]


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
    # -- audio-prompt (zero-shot voice-clone) conditioning --------------------
    use_prompt: bool = False           # reference prompt_audio_feat="spectrogram"
    prompt_dim: int = 80               # prompt mel bins
    prompt_layers: int = 2             # attention blocks in the prompt encoder
    prompt_downsample: int = 4         # stride over prompt frames (TPU redesign)
    prompt_max_frames: int = 0         # 0 = use full prompt


class PromptEncoder(nnx.Module):
    """Reference-audio conditioning encoder: prompt mel -> model-dim frame
    sequence prefixed to the GPT (reference ConditioningEncoder,
    common/gpts/modules.py:169 — conv1x1 + attention stack; here the stack is
    preceded by a strided conv so the prompt costs ``1/downsample`` of the
    GPT's context, which keeps the prefill matmul MXU-shaped)."""

    def __init__(self, n_mels: int, dim: int, n_layers: int = 2,
                 n_heads: int = 4, downsample: int = 4, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.down = nnx.Conv(n_mels, dim, (2 * downsample,),
                             strides=(downsample,), padding="SAME", rngs=rngs)
        self.blocks = nnx.List([
            TransformerBlock(dim, n_heads=n_heads, rngs=rngs)
            for _ in range(n_layers)])
        self.norm = nnx.LayerNorm(dim, rngs=rngs)
        self.downsample = downsample

    def __call__(self, mel: jnp.ndarray, lengths: tp.Optional[jnp.ndarray] = None):
        """mel (B, T, n_mels) -> (emb (B, ceil(T/ds), dim), lengths')."""
        h = nnx.gelu(self.down(mel))
        out_len = (None if lengths is None
                   else jnp.maximum((lengths + self.downsample - 1)
                                    // self.downsample, 1).astype(jnp.int32))
        mask = None if out_len is None else sequence_mask(out_len, h.shape[1])
        for blk in self.blocks:
            h = blk(h, mask=mask)
        return self.norm(h), out_len


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
            block_type=params.block_type, use_prompt=params.use_prompt,
            cond_dim=params.speaker_emb_dim, rngs=rngs)
        self.speaker_emb = nnx.Embed(params.n_speakers, params.speaker_emb_dim, rngs=rngs)
        self.prompt_enc = (PromptEncoder(
            params.prompt_dim, params.dim, n_layers=params.prompt_layers,
            downsample=params.prompt_downsample, rngs=rngs)
            if params.use_prompt else None)

    def _cond(self, inputs):
        sid = inputs.speaker_id if not isinstance(inputs, dict) else inputs.get("speaker_id")
        return None if sid is None else self.speaker_emb(jnp.maximum(sid, 0))

    def _encode_prompt(self, prompt_mel, prompt_lengths=None):
        """(B, T, n_mels) prompt spectrogram -> (emb, lengths) for the GPT."""
        if prompt_mel is None or self.prompt_enc is None:
            return None, None
        if self.p.prompt_max_frames and prompt_mel.shape[1] > self.p.prompt_max_frames:
            prompt_mel = prompt_mel[:, : self.p.prompt_max_frames]
            if prompt_lengths is not None:
                prompt_lengths = jnp.minimum(prompt_lengths,
                                             self.p.prompt_max_frames)
        return self.prompt_enc(prompt_mel, prompt_lengths)

    def __call__(self, inputs, training: bool = True) -> tp.Dict[str, jnp.ndarray]:
        """inputs: mapping (or TTSForwardInput) with 'transcription',
        'waveform' (+ optional 'waveform_lengths', 'speaker_id', and — when
        ``use_prompt`` — 'prompt_mel'/'prompt_mel_lengths' from the WithPrompt
        collate).  Returns the teacher-forced GPT cross-entropy loss dict."""
        get = (inputs.get if isinstance(inputs, dict)
               else lambda k, d=None: getattr(inputs, k, d))
        wav = get("waveform")
        text = get("transcription")
        codes = self.codec.encode(wav)[..., 0]  # first quantizer stream
        if self.p.freeze_codec:
            codes = jax.lax.stop_gradient(codes)
        lens = jnp.full((codes.shape[0],), codes.shape[1], jnp.int32)
        wl = get("waveform_lengths")
        if wl is not None:
            lens = jnp.maximum(wl // self.codec.hop, 1)
        p_emb, p_len = self._encode_prompt(get("prompt_mel"),
                                           get("prompt_mel_lengths"))
        loss = self.gpt.loss(text, codes.astype(jnp.int32), lens,
                             self._cond(inputs),
                             prompt_emb=p_emb, prompt_lengths=p_len)
        return {"gpt_ce": loss}

    def synthesize(self, text_ids: jnp.ndarray,
                   speaker_id: tp.Optional[jnp.ndarray] = None,
                   max_tokens: int = 256, temperature: float = 0.8,
                   key=None, prompt_mel: tp.Optional[jnp.ndarray] = None,
                   prompt_mel_lengths: tp.Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``prompt_mel`` (B, T, n_mels): reference-audio spectrogram for
        zero-shot voice cloning (reference xtts_decoder.py:94-104)."""
        cond = None if speaker_id is None else self.speaker_emb(jnp.maximum(speaker_id, 0))
        p_emb, p_len = self._encode_prompt(prompt_mel, prompt_mel_lengths)
        codes = self.gpt.generate(text_ids, max_tokens=max_tokens,
                                  temperature=temperature, key=key, cond=cond,
                                  prompt_emb=p_emb, prompt_lengths=p_len)
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
        additional = get("additional") or {}
        inputs = {
            "transcription": get("transcription"),
            "waveform": get("waveform"),
            "waveform_lengths": get("waveform_lengths"),
            "speaker_id": get("speaker_id"),
            # WithPrompt collate pairs a same-speaker reference sample
            # (data/collate.py TTSCollateWithPrompt; reference tts_collate.py:157)
            "prompt_mel": additional.get("prompt_mel"),
            "prompt_mel_lengths": additional.get("prompt_mel_lengths"),
        }
        return inputs, {}


def xtts_criterion():
    """XTTSModel returns its loss dict directly; pass it through."""

    def criterion(outputs, targets, step):
        return outputs

    return criterion
