"""Tests for AR decoders, NSF head, extra discriminators, metrics, and the
prosody model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

B, N, T, MELS = 2, 12, 48, 32


def test_taco_decoder_teacher_and_generate(rng):
    from speechflow_tpu.models.tts.ar_decoders import TacoDecoder

    dec = TacoDecoder(dim_in=64, dim_out=MELS, dim=96, rngs=nnx.Rngs(0))
    memory = jnp.asarray(rng.normal(size=(B, N, 64)).astype(np.float32))
    lens = jnp.asarray([N, N - 3], jnp.int32)
    target = jnp.asarray(rng.normal(size=(B, T, MELS)).astype(np.float32))
    frames, gates, attns = dec(memory, lens, target)
    assert frames.shape == (B, T, MELS)
    assert gates.shape == (B, T)
    assert attns.shape == (B, T, N)
    # attention rows are distributions over valid memory
    s = np.asarray(attns).sum(-1)
    assert np.allclose(s, 1.0, atol=1e-4)
    gen_frames, gen_gates = dec.generate(memory, lens, max_frames=16)
    assert gen_frames.shape == (B, 16, MELS)


@pytest.mark.slow
def test_taco_in_parallel_tts(rng):
    from speechflow_tpu.models.tts import ParallelTTSModel, ParallelTTSParams
    from tests.test_tts_model import _inputs

    p = ParallelTTSParams.create(
        n_symbols=60, n_speakers=4, n_mels=40, encoder_dim=64, encoder_layers=2,
        decoder_type="taco", decoder_dim=96, token_emb_dim=64, speaker_emb_dim=32,
        postnet_dim=64, max_output_length=64)
    model = ParallelTTSModel(p, rngs=nnx.Rngs(0))
    inp = _inputs(rng)
    out = model(inp, training=True)
    assert out.spectrogram.shape[2] == 64
    assert "taco_attention" in out.additional_content


@pytest.mark.slow
def test_gpt_decoder_overfits(rng):
    from speechflow_tpu.models.tts.ar_decoders import GPTDecoder

    import optax

    gpt = GPTDecoder(n_text_tokens=20, n_audio_tokens=34, dim=64, n_layers=2,
                     n_heads=2, rngs=nnx.Rngs(0))
    text = jnp.asarray(rng.integers(0, 20, (B, 6)), jnp.int32)
    audio = jnp.asarray(rng.integers(0, 32, (B, 10)), jnp.int32)
    lens = jnp.asarray([10, 8], jnp.int32)
    opt = nnx.Optimizer(gpt, optax.adam(3e-3), wrt=nnx.Param)

    @nnx.jit
    def step(gpt, opt):
        loss, grads = nnx.value_and_grad(
            lambda m: m.loss(text, audio, lens))(gpt)
        opt.update(gpt, grads)
        return loss

    first = float(step(gpt, opt))
    for _ in range(60):
        last = float(step(gpt, opt))
    assert last < first * 0.5, (first, last)
    toks = gpt.generate(text, max_tokens=10, temperature=0.0)
    assert toks.shape == (B, 10)


@pytest.mark.slow
def test_gpt_kv_cache_parity(rng):
    """KV-cached generate must reproduce the O(T^2) full-trunk path exactly
    (greedy), for both attention and retention blocks, with and without cond."""
    from speechflow_tpu.models.tts.ar_decoders import GPTDecoder

    text = jnp.asarray(rng.integers(0, 20, (2, 7)), jnp.int32)
    cond = jnp.asarray(rng.normal(size=(2, 12)).astype(np.float32))
    for block_type in ("attention", "retention"):
        gpt = GPTDecoder(n_text_tokens=20, n_audio_tokens=34, dim=64, n_layers=2,
                         n_heads=2, cond_dim=12, block_type=block_type,
                         rngs=nnx.Rngs(3))
        for c in (None, cond):
            fast = gpt.generate(text, max_tokens=24, temperature=0.0, cond=c)
            slow = gpt.generate_naive(text, max_tokens=24, temperature=0.0, cond=c)
            assert np.array_equal(np.asarray(fast), np.asarray(slow)), block_type


@pytest.mark.slow
def test_nsf_head(rng):
    from speechflow_tpu.models.vocoder.nsf import NSFHiFiGANHead, NSFiSTFTHead, SineGen

    sg = SineGen(24000, n_harmonics=4, rngs=nnx.Rngs(0))
    f0 = jnp.asarray(np.full((1, 8), 220.0, np.float32))
    src = sg(f0, 256)
    assert src.shape == (1, 8 * 256, 5)

    head = NSFHiFiGANHead(dim=48, upsample_rates=(4, 4, 4, 4), channels=64,
                          style_dim=16, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.normal(size=(1, 8, 48)).astype(np.float32))
    style = jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32))
    wav = head(x, f0, style)
    assert wav.shape == (1, 8 * 256)
    assert np.isfinite(np.asarray(wav)).all()

    ih = NSFiSTFTHead(dim=48, n_fft=512, hop_length=256, style_dim=16, rngs=nnx.Rngs(0))
    wav2 = ih(x, f0, style)
    assert wav2.shape[0] == 1 and np.isfinite(np.asarray(wav2)).all()


@pytest.mark.slow
def test_extra_discriminators(rng):
    from speechflow_tpu.models.vocoder.extra_discriminators import (
        MultiBandDiscriminator,
        MultiScaleLogFreqDiscriminator,
    )

    wav = jnp.asarray(rng.normal(size=(2, 4096)).astype(np.float32) * 0.3)
    mb = MultiBandDiscriminator(channels=8, rngs=nnx.Rngs(0))
    logits, fmaps = mb(wav)
    assert len(logits) == 4
    ms = MultiScaleLogFreqDiscriminator(scales=((512, 128),), channels=8, rngs=nnx.Rngs(1))
    logits2, _ = ms(wav)
    assert len(logits2) == 1
    for lg in logits + logits2:
        assert np.isfinite(np.asarray(lg)).all()


def test_vocoder_metrics(rng):
    from speechflow_tpu.models.vocoder.metrics import (
        mel_cepstral_distortion,
        periodicity_metrics,
        si_snr,
    )

    sr = 24000
    t = np.arange(sr) / sr
    real = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    fake_same = real + 0.01 * rng.normal(size=real.shape).astype(np.float32)
    fake_diff = (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)[None]

    m_same = periodicity_metrics(fake_same, real, sr)
    assert m_same["voicing_f1"] > 0.9
    assert m_same["pitch_rmse_hz"] < 5
    m_diff = periodicity_metrics(fake_diff, real, sr)
    assert m_diff["pitch_rmse_hz"] > 50

    # identical signals -> ~0 distortion; different tone -> clearly nonzero
    assert mel_cepstral_distortion(real, real) < 0.1
    assert mel_cepstral_distortion(fake_diff, real) > 10.0
    assert si_snr(fake_same, real) > 20
    assert si_snr(fake_diff, real) < 0


@pytest.mark.slow
def test_prosody_model_and_eer(rng):
    from speechflow_tpu.models.prosody import ProsodyCriterion, ProsodyModel, ProsodyParams
    from speechflow_tpu.models.prosody.criterion import eer

    p = ProsodyParams.create(vocab_size=100, n_classes=4, dim=32, n_layers=1, n_heads=2)
    m = ProsodyModel(p, rngs=nnx.Rngs(0))
    batch = {"token_ids": jnp.asarray(rng.integers(1, 100, (2, 16)), jnp.int32),
             "lengths": jnp.asarray([16, 10], jnp.int32)}
    out = m(batch)
    assert out["binary"].shape == (2, 16, 2)
    assert out["category"].shape == (2, 16, 4)
    tgt = {"binary": jnp.asarray(rng.integers(-1, 2, (2, 16)), jnp.int32),
           "category": jnp.asarray(rng.integers(-1, 4, (2, 16)), jnp.int32)}
    losses = ProsodyCriterion()(out, tgt, 0)
    assert np.isfinite(float(losses["binary"])) and np.isfinite(float(losses["category"]))
    # EER sanity: perfect separation -> 0
    assert eer([0.9, 0.8, 0.1, 0.2], [1, 1, 0, 0]) == 0.0
