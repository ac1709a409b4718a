"""Vocoder feature extractors.

Capability parity with the reference Vocos extractors
(tts/vocoders/vocos/modules/feature_extractors/{mel.py:22,audio.py:139}):
``MelFeatures`` computes log-mel from the waveform *on device* inside the same
jit program as the generator (one fused XLA program per step — no host mel
hop), ``AudioFeatures`` passes through precomputed features (mel / SSL / codec
latents) from the batch. ``TTSFeatures`` (full acoustic model as extractor,
tts.py:26) plugs in once the acoustic model package is wired.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import nnx

from speechflow_tpu import ops

__all__ = ["MelFeatures", "AudioFeatures", "CodecFeatures"]


class MelFeatures(nnx.Module):
    def __init__(self, sample_rate: int = 24000, n_fft: int = 1024,
                 hop_length: int = 256, n_mels: int = 100,
                 normalize: bool = False, rngs: tp.Optional[nnx.Rngs] = None):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.n_mels = n_mels
        self.normalize = normalize

    @property
    def dim(self) -> int:
        return self.n_mels

    def __call__(self, inputs) -> jnp.ndarray:
        wav = inputs["waveform"] if isinstance(inputs, dict) else inputs.waveform
        mag = ops.magnitude(wav, self.n_fft, self.hop_length)
        mel = ops.linear_to_mel(mag, self.sample_rate, self.n_mels)
        mel = ops.amp_to_db(mel)
        if self.normalize:
            mel = ops.normalize_mel(mel)
        # all T = N//hop + 1 centered frames; the generator crops its output
        # to (T-1)*hop == N samples, the exact inverse convention
        return mel


class AudioFeatures(nnx.Module):
    """Pass through a precomputed feature stream (mel / ssl_feat / ac_feat)."""

    def __init__(self, feature: str = "mel", dim_in: int = 100,
                 proj_dim: tp.Optional[int] = None, rngs: tp.Optional[nnx.Rngs] = None):
        self.feature = feature
        self._dim = proj_dim or dim_in
        self.proj = None
        if proj_dim is not None:
            self.proj = nnx.Linear(dim_in, proj_dim, rngs=rngs or nnx.Rngs(0))

    @property
    def dim(self) -> int:
        return self._dim

    def __call__(self, inputs) -> jnp.ndarray:
        feat = inputs[self.feature] if isinstance(inputs, dict) else getattr(inputs, self.feature)
        if self.proj is not None:
            feat = self.proj(feat)
        return feat


class CodecFeatures(nnx.Module):
    """Neural-codec front-end: waveform -> encoder -> residual VQ -> quantized
    latents as the vocoder's features.

    The mel_dac-equivalent recipe (reference: tts/vocoders/configs/vocos/
    mel_dac.yml + vocos/modules/feature_extractors/audio.py DAC branch):
    the reference trains Vocos to decode pretrained-DAC latents; with no
    downloadable codecs offline, this extractor uses the framework's trainable
    NeuralCodec encoder+RVQ (models/codec/rvq.py). The codec trains jointly —
    its commitment loss surfaces through the (features, losses) tuple exactly
    like the E2E TTS extractor — or is frozen when warm-started from a codec
    experiment checkpoint (``freeze=True``).
    """

    def __init__(self, codec_params: tp.Optional[dict] = None, freeze: bool = False,
                 rngs: tp.Optional[nnx.Rngs] = None):
        from speechflow_tpu.models.codec import CodecParams, NeuralCodec

        self.codec = NeuralCodec(CodecParams.create(dict(codec_params or {})),
                                 rngs=rngs or nnx.Rngs(0))
        self.freeze = freeze
        self.dim = self.codec.p.latent_dim
        self.hop = self.codec.hop

    def __call__(self, inputs):
        import jax

        wav = inputs["waveform"] if isinstance(inputs, dict) else inputs.waveform
        z = self.codec.encode_latent(wav)
        q, _, vq_loss = self.codec.rvq(z)
        if self.freeze:
            return jax.lax.stop_gradient(q)
        return q, {"codec_vq": vq_loss}
