"""Vocoder GAN criteria.

Capability parity with the reference vocoder losses
(tts/vocoders/vocos/losses.py:32-367): hinge adversarial losses, feature
matching, log-mel reconstruction, multi-resolution STFT loss; composed into
gen/disc criterion callables for GANTrainer (alternation semantics of
vocos/lightning_engine.py:36).
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp

from speechflow_tpu import ops

__all__ = ["mel_reconstruction_loss", "multires_stft_loss",
           "vocoder_gen_criterion", "vocoder_disc_criterion"]


def mel_reconstruction_loss(fake: jnp.ndarray, real: jnp.ndarray,
                            sample_rate: int = 24000, n_fft: int = 1024,
                            hop_length: int = 256, n_mels: int = 100) -> jnp.ndarray:
    t = min(fake.shape[-1], real.shape[-1])
    fake, real = fake[..., :t], real[..., :t]

    def logmel(w):
        mag = ops.magnitude(w, n_fft, hop_length)
        return ops.amp_to_db(ops.linear_to_mel(mag, sample_rate, n_mels))

    return jnp.mean(jnp.abs(logmel(fake) - logmel(real)))


def multires_stft_loss(fake: jnp.ndarray, real: jnp.ndarray,
                       resolutions=((512, 128), (1024, 256), (2048, 512))) -> jnp.ndarray:
    t = min(fake.shape[-1], real.shape[-1])
    fake, real = fake[..., :t], real[..., :t]
    total = 0.0
    for n_fft, hop in resolutions:
        mf = ops.magnitude(fake, n_fft, hop)
        mr = ops.magnitude(real, n_fft, hop)
        sc = jnp.linalg.norm(mr - mf) / jnp.maximum(jnp.linalg.norm(mr), 1e-6)
        lm = jnp.mean(jnp.abs(jnp.log(mf + 1e-5) - jnp.log(mr + 1e-5)))
        total = total + sc + lm
    return total / len(resolutions)


def _hinge_gen(logits: tp.Sequence[jnp.ndarray]) -> jnp.ndarray:
    return sum(jnp.mean(jnp.maximum(0.0, 1.0 - lg)) for lg in logits) / len(logits)


def _hinge_disc(real_logits, fake_logits) -> jnp.ndarray:
    loss = 0.0
    for lr, lf in zip(real_logits, fake_logits):
        loss = loss + jnp.mean(jnp.maximum(0.0, 1.0 - lr)) + jnp.mean(jnp.maximum(0.0, 1.0 + lf))
    return loss / len(real_logits)


def _feature_matching(real_fmaps, fake_fmaps) -> jnp.ndarray:
    loss, n = 0.0, 0
    for rf, ff in zip(real_fmaps, fake_fmaps):
        for r, f in zip(rf, ff):
            loss = loss + jnp.mean(jnp.abs(r - f))
            n += 1
    return loss / max(n, 1)


def vocoder_gen_criterion(sample_rate: int = 24000, n_mels: int = 100,
                          mel_weight: float = 45.0, fm_weight: float = 2.0,
                          stft_weight: float = 1.0, adv_weight: float = 1.0,
                          adv_start_iter: int = 0):
    def criterion(gen_out, disc, inputs, targets, step):
        ft_losses = {}
        if isinstance(gen_out, tuple):  # E2E extractor returns (wav, ft_losses)
            gen_out, ft_losses = gen_out
        real = targets["waveform"]
        t = min(gen_out.shape[-1], real.shape[-1])
        fake, real = gen_out[..., :t], real[..., :t]
        losses = {
            "mel": mel_weight * mel_reconstruction_loss(fake, real, sample_rate, n_mels=n_mels),
            "stft": stft_weight * multires_stft_loss(fake, real),
        }
        fake_logits, fake_fmaps = disc(fake)
        real_logits, real_fmaps = disc(real)
        gate = (step >= adv_start_iter).astype(jnp.float32)
        losses["adv"] = adv_weight * gate * _hinge_gen(fake_logits)
        losses["fm"] = fm_weight * gate * _feature_matching(real_fmaps, fake_fmaps)
        losses.update(ft_losses)
        return losses

    return criterion


def vocoder_disc_criterion():
    def criterion(gen_out, disc, inputs, targets, step):
        if isinstance(gen_out, tuple):  # E2E extractor returns (wav, ft_losses)
            gen_out = gen_out[0]
        real = targets["waveform"]
        t = min(gen_out.shape[-1], real.shape[-1])
        fake, real = gen_out[..., :t], real[..., :t]
        fake_logits, _ = disc(fake)
        real_logits, _ = disc(real)
        return {"disc_hinge": _hinge_disc(real_logits, fake_logits)}

    return criterion
