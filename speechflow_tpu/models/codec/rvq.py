"""Neural audio codec: conv encoder + residual vector quantization + decoder.

Capability parity with the reference's audio-codec features
(audio_processors.py:378 ACProcessor over DescriptAC/StableAC/VocosAC):
pretrained codecs aren't downloadable in this zero-egress environment, so the
framework ships a *trainable* DAC-class codec: a strided-conv encoder
(waveform -> latents at hop R), an N-stage residual VQ (each stage quantizes
the previous stage's residual — straight-through, commitment losses), and a
mirrored transposed-conv decoder. `encode()` yields the (T', n_q) code grid
the XTTS-style GPTDecoder consumes; `decode()` reconstructs audio. Trains with
L1 + multi-resolution STFT reconstruction (GAN-finetune via the vocoder
discriminators drops in unchanged).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.models.tts.common import VectorQuantizer
from speechflow_tpu.training.base_model import BaseModelParams

__all__ = ["CodecParams", "ResidualVQ", "NeuralCodec", "CodecDecoder"]


class CodecParams(BaseModelParams):
    sample_rate: int = 24000
    channels: int = 64
    latent_dim: int = 128
    strides: tp.Tuple[int, ...] = (4, 4, 8)   # total hop = prod
    n_quantizers: int = 4
    codebook_size: int = 256


class ResidualVQ(nnx.Module):
    def __init__(self, n_quantizers: int, codebook_size: int, dim: int,
                 rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.stages = nnx.List([
            VectorQuantizer(codebook_size, dim, rngs=rngs) for _ in range(n_quantizers)
        ])

    def __call__(self, z: jnp.ndarray):
        """(B, T, D) -> (quantized, codes (B, T, n_q), vq_loss)."""
        residual = z
        quantized = jnp.zeros_like(z)
        codes = []
        total_loss = 0.0
        for vq in self.stages:
            q, idx, loss = vq(residual)
            residual = residual - jax.lax.stop_gradient(q)
            quantized = quantized + q
            codes.append(idx)
            total_loss = total_loss + loss
        return quantized, jnp.stack(codes, axis=-1), total_loss / len(self.stages)

    def lookup(self, codes: jnp.ndarray) -> jnp.ndarray:
        """(B, T, n_q) int codes -> (B, T, D) latents."""
        out = 0.0
        for i, vq in enumerate(self.stages):
            out = out + vq.codebook[...][codes[..., i]]
        return out


class CodecDecoder(nnx.Module):
    """Standalone mirrored transposed-conv decoder: latents -> waveform.

    Split out of ``NeuralCodec`` so consumers that only decode (the vocoder
    ``DACHead``) don't carry dead encoder/RVQ parameters into their optimizer
    state and checkpoints."""

    def __init__(self, params: CodecParams, rngs: tp.Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        p = params
        ch = p.channels * (2 ** len(p.strides))
        self.dec_pre = nnx.Conv(p.latent_dim, ch, (3,), padding="SAME", rngs=rngs)
        self.dec = nnx.List([])
        for s in reversed(p.strides):
            self.dec.append(nnx.ConvTranspose(ch, ch // 2, (2 * s,), strides=(s,),
                                              padding="SAME", rngs=rngs))
            ch //= 2
        self.dec_post = nnx.Conv(ch, 1, (7,), padding="SAME", rngs=rngs)
        self.hop = int(np.prod(p.strides))

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        x = nnx.elu(self.dec_pre(z))
        for conv in self.dec:
            x = nnx.elu(conv(x))
        return jnp.tanh(self.dec_post(x))[..., 0]


class NeuralCodec(nnx.Module):
    def __init__(self, params: CodecParams, rngs: tp.Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        p = params
        self.p = p
        ch = p.channels
        self.enc_pre = nnx.Conv(1, ch, (7,), padding="SAME", rngs=rngs)
        self.enc = nnx.List([])
        for s in p.strides:
            self.enc.append(nnx.Conv(ch, ch * 2, (2 * s,), strides=(s,),
                                     padding="SAME", rngs=rngs))
            ch *= 2
        self.enc_post = nnx.Conv(ch, p.latent_dim, (3,), padding="SAME", rngs=rngs)
        self.enc_norm = nnx.LayerNorm(p.latent_dim, rngs=rngs)  # bounded latents keep RVQ stable
        self.rvq = ResidualVQ(p.n_quantizers, p.codebook_size, p.latent_dim, rngs=rngs)
        self.decoder = CodecDecoder(p, rngs=rngs)
        self.hop = self.decoder.hop

    # -- stages -----------------------------------------------------------

    def encode_latent(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = wav[..., None]
        x = nnx.elu(self.enc_pre(x))
        for conv in self.enc:
            x = nnx.elu(conv(x))
        return self.enc_norm(self.enc_post(x))

    def decode_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z)

    # -- public API -------------------------------------------------------------

    def __call__(self, wav: jnp.ndarray):
        """Training forward: (recon_wav, codes, vq_loss)."""
        z = self.encode_latent(wav)
        q, codes, vq_loss = self.rvq(z)
        recon = self.decode_latent(q)
        return recon[..., : wav.shape[-1]], codes, vq_loss

    def encode(self, wav: jnp.ndarray) -> jnp.ndarray:
        _, codes, _ = self.rvq(self.encode_latent(wav))
        return codes

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        return self.decode_latent(self.rvq.lookup(codes))


def codec_criterion(sample_rate: int = 24000, vq_weight: float = 1.0,
                    stft_weight: float = 1.0):
    """L1 + multires STFT + VQ losses for Trainer."""
    from speechflow_tpu.models.vocoder.criterion import multires_stft_loss

    def criterion(outputs, targets, step):
        recon, codes, vq_loss = outputs
        real = targets["waveform"][..., : recon.shape[-1]]
        return {
            "l1": jnp.mean(jnp.abs(recon - real)),
            "stft": stft_weight * multires_stft_loss(recon, real,
                                                     resolutions=((512, 128), (1024, 256))),
            "vq": vq_weight * vq_loss,
        }

    return criterion
