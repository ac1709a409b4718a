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


def make_cpc_perceptual_loss(cpc_ckpt: str):
    """SLM feature loss (reference: vocos/losses.py:319 WavLMLoss over
    frozen pretrained WavLM): mean L1 between frozen framework-CPC features
    of generated and real audio. The CPC weights are constants under jit —
    only the generator receives gradients."""
    import jax

    from flax import nnx

    from speechflow_tpu.models.ssl import CPCModel, CPCParams
    from speechflow_tpu.utils.state_io import load_module

    model, _ = load_module(CPCModel, CPCParams, cpc_ckpt)
    # split once; merge inside the (jit'd) loss so the frozen weights enter
    # the trace as constants with trace-local Variables
    graphdef, state = nnx.split(model)

    def loss(fake: jnp.ndarray, real: jnp.ndarray) -> jnp.ndarray:
        m = nnx.merge(graphdef, jax.lax.stop_gradient(state))
        f = m(fake)
        r = jax.lax.stop_gradient(m(real))
        return jnp.mean(jnp.abs(f - r))

    return loss


def make_speaker_similarity_loss(bio_ckpt: str, sample_rate: int = 24000,
                                 n_fft: int = 1024, hop: int = 256):
    """Speaker-similarity loss (reference: vocos/losses.py:273
    SpeakerSimilarityLoss over a pretrained biometric model): 1 - cosine
    between frozen framework-ECAPA embeddings of generated and real audio,
    with the log-mel front-end computed on device inside the same program."""
    import jax

    from flax import nnx

    from speechflow_tpu.models.biometric import ECAPAEmbedder, ECAPAParams
    from speechflow_tpu.utils.state_io import load_module

    model, params = load_module(ECAPAEmbedder, ECAPAParams, bio_ckpt)
    n_mels = params.n_mels
    graphdef, state = nnx.split(model)

    def embed(wav):
        m = nnx.merge(graphdef, jax.lax.stop_gradient(state))
        mag = ops.magnitude(wav, n_fft, hop)
        mel = ops.amp_to_db(ops.linear_to_mel(mag, sample_rate, n_mels))
        emb = m(mel)
        return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-9)

    def loss(fake: jnp.ndarray, real: jnp.ndarray) -> jnp.ndarray:
        e_f = embed(fake)
        e_r = jax.lax.stop_gradient(embed(real))
        return jnp.mean(1.0 - jnp.sum(e_f * e_r, axis=-1))

    return loss


def vocoder_gen_criterion(sample_rate: int = 24000, n_mels: int = 100,
                          mel_weight: float = 45.0, fm_weight: float = 2.0,
                          stft_weight: float = 1.0, adv_weight: float = 1.0,
                          adv_start_iter: int = 0,
                          adv_ramp_steps: int = 0,
                          cpc_ckpt: tp.Optional[str] = None,
                          cpc_weight: float = 1.0,
                          bio_ckpt: tp.Optional[str] = None,
                          speaker_sim_weight: float = 1.0):
    cpc_loss = make_cpc_perceptual_loss(cpc_ckpt) if cpc_ckpt else None
    spk_loss = (make_speaker_similarity_loss(bio_ckpt, sample_rate)
                if bio_ckpt else None)

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
        # Ramp the adversarial pressure in over adv_ramp_steps instead of a
        # step function: at adv_start the discriminator is still coarse, and
        # a full-strength hinge gradient from it measurably degrades fidelity
        # (r4 convergence record: val/pesq_wb fell 1.50 -> 1.47 across the
        # adversarial phase with the hard gate).
        gate = (step >= adv_start_iter).astype(jnp.float32)
        if adv_ramp_steps > 0:
            gate = gate * jnp.clip(
                (step - adv_start_iter + 1) / adv_ramp_steps, 0.0, 1.0)
        losses["adv"] = adv_weight * gate * _hinge_gen(fake_logits)
        losses["fm"] = fm_weight * gate * _feature_matching(real_fmaps, fake_fmaps)
        if cpc_loss is not None:
            losses["cpc"] = cpc_weight * cpc_loss(fake, real)
        if spk_loss is not None:
            losses["spk_sim"] = speaker_sim_weight * spk_loss(fake, real)
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
