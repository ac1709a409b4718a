"""Vocos generator: FeatureExtractor -> Backbone -> Head.

Capability parity with the reference Vocos assembly
(tts/vocoders/vocos/pretrained.py:47, lightning_engine.py:246-260 forward):
the three stages are selected by params (extractor: mel|audio|codec|tts,
backbone: vocos|dummy, head: istft|snake_upsample|imdct_symexp|imdct_cos|
nsf_hifigan|nsf_istft|dac) and the whole generator is one jit program
including on-device mel extraction.  The NSF heads (reference StyleTTS2 path,
tts/vocoders/vocos/modules/heads/nsf_hifigan.py:37) additionally consume a
frame-level F0 — from the batch's ``pitch`` field (copy synthesis) or the
acoustic model's pitch prediction (E2E ``tts`` extractor) — plus an optional
style embedding for AdaIN conditioning.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import nnx

from speechflow_tpu.models.vocoder.backbones import DummyBackbone, VocosBackbone
from speechflow_tpu.models.vocoder.feature_extractors import (
    AudioFeatures,
    CodecFeatures,
    MelFeatures,
)
from speechflow_tpu.models.vocoder.heads import (
    DACHead,
    IMDCTCosHead,
    IMDCTSymExpHead,
    ISTFTHead,
    SnakeUpsampleHead,
)
from speechflow_tpu.training.base_model import BaseModelParams

__all__ = ["Vocos", "VocosParams"]


class VocosParams(BaseModelParams):
    sample_rate: int = 24000
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 100

    feature_extractor: str = "mel"         # mel | audio | codec | tts (E2E, SURVEY §A.5)
    input_feature: str = "mel"             # for "audio": field name in inputs
    tts_params: dict = {}                  # for "tts": ParallelTTSParams fields
    codec_params: dict = {}                # for "codec": CodecParams fields
    codec_freeze: bool = False             # freeze the codec front-end
    dac_codec_params: dict = {}            # for head "dac": CodecParams fields
    backbone: str = "vocos"                # vocos | dummy
    head: str = "istft"                    # istft | snake_upsample | imdct_symexp
    #                                      # | imdct_cos | nsf_hifigan | nsf_istft | dac

    dim: int = 512
    n_layers: int = 8
    mlp_ratio: int = 3
    cond_dim: tp.Optional[int] = None      # speaker-emb conditioning
    upsample_rates: tp.Tuple[int, ...] = (8, 8, 2, 2)
    upsample_channels: int = 256
    resblock_kernel_sizes: tp.Tuple[int, ...] = (3,)  # MRF; bigvgan: (3, 7, 11)
    # FIR length of the anti-aliased snake (both interp + decim filters).
    # Parameter-free, so train-time recipes may reduce it for throughput and
    # still infer at the full 12 taps from the same checkpoint.
    snake_taps: int = 12
    # False = let XLA save the anti-alias phase intermediates for backward
    # instead of the custom-VJP recompute: faster GAN training at chunk
    # sizes, more activation memory at long-utterance inference (which has
    # no backward, so the flag only matters under grad)
    snake_remat: bool = True
    mdct_frame_len: int = 512
    style_dim: int = 128                   # NSF AdaIN style-embedding dim
    n_harmonics: int = 8                   # NSF sine-source harmonics


class Vocos(nnx.Module):
    def __init__(self, params: VocosParams, rngs: tp.Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.params = params
        p = params

        if p.feature_extractor == "mel":
            self.feature_extractor = MelFeatures(p.sample_rate, p.n_fft, p.hop_length,
                                                 p.n_mels, rngs=rngs)
        elif p.feature_extractor == "audio":
            self.feature_extractor = AudioFeatures(p.input_feature, p.n_mels, rngs=rngs)
        elif p.feature_extractor == "codec":
            # mel_dac-equivalent: trainable RVQ codec latents as features
            self.feature_extractor = CodecFeatures(p.codec_params,
                                                   freeze=p.codec_freeze, rngs=rngs)
        elif p.feature_extractor == "tts":
            # E2E GAN-TTS: the full acoustic model is the extractor; its
            # losses surface through __call__'s ft_losses (SURVEY §A.5)
            from speechflow_tpu.models.tts import ParallelTTSParams
            from speechflow_tpu.models.vocoder.tts_features import TTSFeatures

            tts_p = ParallelTTSParams.create(dict(p.tts_params, n_mels=p.n_mels))
            self.feature_extractor = TTSFeatures(tts_p, rngs=rngs)
        else:
            raise ValueError(p.feature_extractor)

        feat_dim = self.feature_extractor.dim
        if p.backbone == "vocos":
            self.backbone = VocosBackbone(feat_dim, p.dim, p.n_layers, p.mlp_ratio,
                                          cond_dim=p.cond_dim, rngs=rngs)
        elif p.backbone == "dummy":
            self.backbone = DummyBackbone(feat_dim)
        else:
            raise ValueError(p.backbone)

        bdim = self.backbone.dim
        self.nsf_head = p.head.startswith("nsf")
        if p.head == "istft":
            self.head = ISTFTHead(bdim, p.n_fft, p.hop_length, rngs=rngs)
        elif p.head == "snake_upsample":
            self.head = SnakeUpsampleHead(
                bdim, p.upsample_rates, channels=p.upsample_channels,
                resblock_kernel_sizes=p.resblock_kernel_sizes,
                taps=p.snake_taps, remat=p.snake_remat, rngs=rngs)
        elif p.head == "imdct_symexp":
            self.head = IMDCTSymExpHead(bdim, p.mdct_frame_len, rngs=rngs)
        elif p.head == "imdct_cos":
            self.head = IMDCTCosHead(bdim, p.mdct_frame_len, rngs=rngs)
        elif p.head == "dac":
            # reference heads/dac.py: backbone hidden -> codec latent ->
            # codec decoder; here the trainable NeuralCodec decoder
            self.head = DACHead(bdim, p.hop_length, p.dac_codec_params, rngs=rngs)
        elif p.head == "nsf_hifigan":
            from speechflow_tpu.models.vocoder.nsf import NSFHiFiGANHead

            self.head = NSFHiFiGANHead(
                bdim, p.upsample_rates, channels=p.upsample_channels,
                style_dim=p.style_dim, sample_rate=p.sample_rate,
                n_harmonics=p.n_harmonics, rngs=rngs)
        elif p.head == "nsf_istft":
            from speechflow_tpu.models.vocoder.nsf import NSFiSTFTHead

            self.head = NSFiSTFTHead(
                bdim, p.n_fft, p.hop_length, style_dim=p.style_dim,
                sample_rate=p.sample_rate, n_harmonics=p.n_harmonics, rngs=rngs)
        else:
            raise ValueError(p.head)

    def fold_inference(self, target: int = 384, threshold: int = 256) -> bool:
        """Swap a SnakeUpsampleHead for its exact folded-inference equivalent
        (models/vocoder/folded_head.py): the small-channel high-rate stages
        run space-to-depth folded at ~``target`` feature width, which is the
        measured TPU layout fix for this head (docs/vocoder_roofline.md).

        Load weights first, then fold — the transform scatters the trained
        kernels.  Returns True if the head was folded (no-op for other
        heads).  Inference-only: do not train a folded model.
        """
        from speechflow_tpu.models.vocoder.folded_head import FoldedSnakeHead

        if isinstance(self.head, SnakeUpsampleHead):
            self.head = FoldedSnakeHead(self.head, target=target,
                                        threshold=threshold)
            return True
        return False

    def _resolve_f0_style(self, inputs, aux, t_frames: int):
        """Frame-level F0 (batch pitch field, else the acoustic model's
        prediction) padded/trimmed to the feature frame count, plus the AdaIN
        style embedding (style_emb, else speaker_emb)."""
        f0 = style = None
        if isinstance(inputs, dict):
            f0 = inputs.get("pitch")
            style = inputs.get("style_emb", inputs.get("speaker_emb"))
        if f0 is None:
            f0 = aux.get("pitch")
        if f0 is None:
            raise ValueError(
                f"head {self.params.head!r} needs a frame-level F0: provide a "
                "'pitch' batch field (pitch handler in the data pipe) or use "
                "the 'tts' feature extractor whose pitch prediction is wired "
                "through automatically")
        if f0.shape[1] < t_frames:
            f0 = jnp.pad(f0, ((0, 0), (0, t_frames - f0.shape[1])))
        return f0[:, :t_frames], style

    def __call__(self, inputs: tp.Mapping[str, jnp.ndarray]):
        feats = self.feature_extractor(inputs)
        ft_losses, aux = None, {}
        if isinstance(feats, tuple):  # TTSFeatures: (mel, ft_losses[, aux])
            feats, ft_losses, *rest = feats
            aux = rest[0] if rest else {}
        cond = inputs.get("speaker_emb") if isinstance(inputs, dict) else None
        h = self.backbone(feats, cond)
        if self.nsf_head:
            f0, style = self._resolve_f0_style(inputs, aux, feats.shape[1])
            wav = self.head(h, f0, style)
        else:
            wav = self.head(h)
        # uniform contract: T feature frames -> exactly (T-1)*hop samples
        wav = wav[..., : (feats.shape[1] - 1) * self.params.hop_length]
        return wav if ft_losses is None else (wav, ft_losses)

    def features(self, inputs) -> jnp.ndarray:
        return self.feature_extractor(inputs)

    def from_features(self, feats: jnp.ndarray,
                      cond: tp.Optional[jnp.ndarray] = None,
                      f0: tp.Optional[jnp.ndarray] = None,
                      style: tp.Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Bypass the feature extractor: (B, T, feat_dim) -> waveform.

        The TTS->vocoder handoff path (SURVEY §A.4): the acoustic model's mel
        goes straight to backbone + head. Caller must match the training-time
        feature convention (log-mel scale/normalization).  NSF heads take the
        acoustic model's frame-level F0 prediction via ``f0`` (zeros = fully
        unvoiced source if the caller has none) and AdaIN style via ``style``.
        """
        h = self.backbone(feats, cond)
        if self.nsf_head:
            if f0 is None:
                f0 = jnp.zeros(feats.shape[:2], feats.dtype)
            f0, style = self._resolve_f0_style({"pitch": f0, "style_emb": style},
                                               {}, feats.shape[1])
            wav = self.head(h, f0, style)
        else:
            wav = self.head(h)
        return wav[..., : (feats.shape[1] - 1) * self.params.hop_length]
