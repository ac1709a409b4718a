"""Waveform denoiser tests: the trainable demucs-class model
(models/denoiser/demucs.py, reference: facebook dns64 via
audio_processors.py:427) and the `denoise` pipeline handler."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

from speechflow_tpu.models.denoiser import (
    WaveDenoiser,
    WaveDenoiserParams,
    denoiser_criterion,
)

SR = 24000


def _clean(n, seed=0, f0=180.0):
    t = np.arange(n) / SR
    rng = np.random.default_rng(seed)
    sig = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 4))
    env = 0.5 * (1 - np.cos(2 * np.pi * t / t[-1]))
    return (0.3 * sig * env).astype(np.float32)


def test_denoiser_shapes_and_norm():
    model = WaveDenoiser(WaveDenoiserParams(channels=8, depth=3), rngs=nnx.Rngs(0))
    wav = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, (2, 4096)).astype(np.float32))
    out = model(wav)
    assert out.shape == wav.shape
    assert np.isfinite(np.asarray(out)).all()
    # odd length also works (internal padding)
    out2 = model(wav[:, :4000])
    assert out2.shape == (2, 4000)


@pytest.mark.slow
def test_denoiser_learns_to_remove_noise():
    rng = np.random.default_rng(0)
    n = 8192
    clean = np.stack([_clean(n, s, f0) for s, f0 in ((0, 150), (1, 220))])
    noise = 0.1 * rng.standard_normal(clean.shape).astype(np.float32)
    noisy = clean + noise

    model = WaveDenoiser(WaveDenoiserParams(channels=16, depth=3), rngs=nnx.Rngs(0))
    opt = nnx.Optimizer(model, optax.adam(3e-4), wrt=nnx.Param)
    crit = denoiser_criterion(stft_weight=0.0)

    @nnx.jit
    def step(model, opt, noisy, clean):
        def loss_fn(m):
            out = m(noisy)
            return sum(crit(out, {"clean": clean}, 0).values())

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    noisy_j, clean_j = jnp.asarray(noisy), jnp.asarray(clean)
    first = float(step(model, opt, noisy_j, clean_j))
    for _ in range(60):
        last = float(step(model, opt, noisy_j, clean_j))
    assert last < first * 0.6, (first, last)


def test_denoise_handler_spectral_fallback():
    from speechflow_tpu.data.core.datasample import AudioDataSample
    from speechflow_tpu.data.processors import get_handler
    from speechflow_tpu.io import AudioChunk

    rng = np.random.default_rng(0)
    clean = _clean(SR)
    noise = 0.05 * rng.standard_normal(SR).astype(np.float32)
    ds = AudioDataSample(audio_chunk=AudioChunk(data=clean + noise, sr=SR))
    out = get_handler("denoise")(ds)
    w = out.audio_chunk.waveform
    assert len(w) == SR and np.isfinite(w).all()
    # noise energy in silent edges must drop
    edge = slice(0, 1000)
    assert np.mean(w[edge] ** 2) < np.mean((clean + noise)[edge] ** 2) * 0.6


def test_denoise_handler_model_ckpt(tmp_path):
    from speechflow_tpu.data.core.datasample import AudioDataSample
    from speechflow_tpu.data.processors import get_handler
    from speechflow_tpu.io import AudioChunk
    from speechflow_tpu.utils.state_io import save_module

    params = WaveDenoiserParams(channels=8, depth=2)
    model = WaveDenoiser(params, rngs=nnx.Rngs(0))
    ckpt = save_module(model, params, tmp_path / "den.pkl")
    wav = _clean(SR)
    ds = AudioDataSample(audio_chunk=AudioChunk(data=wav.copy(), sr=SR))
    out = get_handler("denoise")(ds, model_ckpt=str(ckpt))
    w = out.audio_chunk.waveform
    assert len(w) == SR and np.isfinite(w).all()
    assert not np.allclose(w, wav)  # the model actually ran
