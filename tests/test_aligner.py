"""Forced aligner tests: flow invertibility + logdet correctness, MAS-driven
training that aligns a synthetic dataset with known segment boundaries, and
the generate (inverse) path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from speechflow_tpu.models.aligner import (
    AlignerBatchProcessor,
    AlignerCriterion,
    GlowTTSAligner,
    GlowTTSParams,
)
from speechflow_tpu.models.aligner.flows import FlowSpecDecoder
from speechflow_tpu.models.tts.data_types import TTSForwardInput, TTSTarget
from speechflow_tpu.training import OptimizerConfig, Trainer, TrainerConfig

B, N, T, MELS = 2, 6, 48, 16


def test_flow_invertibility(rng):
    flow = FlowSpecDecoder(MELS, n_flows=4, hidden=32, rngs=nnx.Rngs(0))
    mel = jnp.asarray(rng.normal(size=(B, T, MELS)).astype(np.float32))
    lens = jnp.asarray([T, T - 8], jnp.int32)
    z, logdet = flow(mel, lens)
    assert z.shape == (B, T, MELS)
    assert logdet.shape == (B,)
    back, _ = flow(z, lens, reverse=True)
    mask = (np.arange(T)[None, :, None] < np.asarray(lens)[:, None, None] // 2 * 2)
    diff = np.abs(np.asarray(back) - np.asarray(mel)) * mask
    assert diff.max() < 1e-3, diff.max()


def test_flow_logdet_matches_jacobian(rng):
    """Numerical check: logdet equals log|det dJ/dx| on a tiny unmasked case."""
    mels, t = 4, 4
    flow = FlowSpecDecoder(mels, n_flows=2, hidden=16, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.normal(size=(1, t, mels)).astype(np.float32))
    lens = jnp.asarray([t], jnp.int32)

    def f(v):
        z, _ = flow(v.reshape(1, t, mels), lens)
        return z.reshape(-1)

    jac = jax.jacfwd(f)(x.reshape(-1))
    _, logdet_num = np.linalg.slogdet(np.asarray(jac))
    _, logdet = flow(x, lens)
    assert abs(float(logdet[0]) - logdet_num) < 1e-2


def _synthetic_aligned_batch(rng, b=4):
    """Tokens with known per-token mel segments: token k emits mel pattern k."""
    tok = rng.integers(1, 10, size=(b, N)).astype(np.int32)
    durs = rng.integers(4, 12, size=(b, N)).astype(np.int32)
    t_max = 96
    mel = np.zeros((b, t_max, MELS), np.float32)
    lens = []
    for i in range(b):
        pos = 0
        for k in range(N):
            d = durs[i, k]
            pattern = np.zeros(MELS, np.float32)
            pattern[tok[i, k] % MELS] = 2.0
            pattern[(tok[i, k] * 3) % MELS] = -1.5
            mel[i, pos : pos + d] = pattern + 0.05 * rng.normal(size=(d, MELS))
            pos += d
        lens.append(pos)
    inputs = TTSForwardInput(
        transcription=jnp.asarray(tok),
        transcription_lengths=jnp.full((b,), N, jnp.int32),
        speaker_id=jnp.zeros((b,), jnp.int32),
        lang_id=jnp.zeros((b,), jnp.int32),
        mel=jnp.asarray(mel),
        mel_lengths=jnp.asarray(lens, jnp.int32),
    )
    targets = TTSTarget(mel=inputs.mel, mel_lengths=inputs.mel_lengths,
                        transcription_lengths=inputs.transcription_lengths)
    return inputs, targets, durs


@pytest.mark.slow
def test_aligner_trains_and_aligns(rng):
    """MLE training on synthetic data: MAS durations approach ground truth."""
    params = GlowTTSParams.create(n_symbols=12, n_mels=MELS, encoder_dim=48,
                                  encoder_layers=2, n_flows=4, flow_hidden=32)
    model = GlowTTSAligner(params, rngs=nnx.Rngs(0))
    inputs, targets, true_durs = _synthetic_aligned_batch(rng)
    criterion = AlignerCriterion()
    trainer = Trainer(model, criterion, lambda b: b,
                      OptimizerConfig(lr=2e-3),
                      TrainerConfig(max_steps=80, log_every=10**9))
    first = trainer.training_step((inputs, targets))
    for _ in range(79):
        last = trainer.training_step((inputs, targets))
    assert last["mle"] < first["mle"], (first, last)

    durs, path = model.align(inputs)
    durs = np.asarray(durs)
    # interior tokens (ends absorb the //2 rounding of the squeezed grid)
    mean_err = np.abs(durs - true_durs)[:, 1:-1].mean()
    assert mean_err < 4.0, (durs[0], true_durs[0], mean_err)


def test_aligner_generate(rng):
    params = GlowTTSParams.create(n_symbols=12, n_mels=MELS, encoder_dim=48,
                                  encoder_layers=2, n_flows=4, flow_hidden=32)
    model = GlowTTSAligner(params, rngs=nnx.Rngs(0))
    inputs, _, _ = _synthetic_aligned_batch(rng)
    mel, lens = model.generate(inputs, t_out=96)
    assert mel.shape == (4, 96, MELS)
    assert np.isfinite(np.asarray(mel)).all()
