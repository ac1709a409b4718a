"""Data-parallel GAN training parity (VERDICT r3 next-step #3 scaling leg).

The 8-device data-parallel GAN train step (generator fwd+bwd, discriminator
fwd+bwd, both optimizer updates — the program the reference's 5M-step
mel_bigvgan.yml:26 recipe lives in) must produce the same losses as the
unsharded single-device step on the same batch and init.  This pins that the
mesh sharding changes only the layout, never the math (gradient psum-mean ==
global-batch gradient), across TWO steps so optimizer updates are covered.
"""

import numpy as np
import pytest
from flax import nnx

from speechflow_tpu.models.vocoder import (
    Vocos,
    VocoderBatchProcessor,
    VocoderDiscriminator,
    VocosParams,
    vocoder_disc_criterion,
    vocoder_gen_criterion,
)
from speechflow_tpu.training import GANTrainer
from speechflow_tpu.training.optimizer import OptimizerConfig
from speechflow_tpu.training.trainer import TrainerConfig

pytestmark = pytest.mark.slow


def _make_gan(use_mesh: bool) -> GANTrainer:
    params = VocosParams.create(
        sample_rate=24000, n_fft=256, hop_length=64, n_mels=20,
        feature_extractor="mel", backbone="vocos", head="istft",
        dim=32, n_layers=1)
    gen = Vocos(params, rngs=nnx.Rngs(0))
    disc = VocoderDiscriminator(periods=(2,), resolutions=((256, 64),),
                                channels=4, rngs=nnx.Rngs(1))
    return GANTrainer(
        gen, disc, vocoder_gen_criterion(24000, n_mels=20),
        vocoder_disc_criterion(), VocoderBatchProcessor(),
        gen_optimizer=OptimizerConfig(lr=1e-3),
        disc_optimizer=OptimizerConfig(lr=1e-3),
        config=TrainerConfig(max_steps=2, use_mesh=use_mesh),
        disc_every=1,
    )


def test_dp_gan_step_matches_single_device():
    import jax

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    rng = np.random.default_rng(0)
    batches = [
        {"waveform": rng.uniform(-0.5, 0.5, (16, 4096)).astype(np.float32)}
        for _ in range(2)
    ]

    dp, single = _make_gan(use_mesh=True), _make_gan(use_mesh=False)
    assert dp.mesh is not None and dp.mesh.devices.size == 8

    for step, batch in enumerate(batches):
        m_dp = {k: float(v) for k, v in dp.training_step(dict(batch)).items()}
        m_1 = {k: float(v) for k, v in single.training_step(dict(batch)).items()}
        for key in ("gen/total", "gen/mel", "disc/total"):
            assert np.isfinite(m_dp[key])
            # reduction order differs across shards: allow fp accumulation slack
            assert np.isclose(m_dp[key], m_1[key], rtol=2e-4, atol=1e-5), (
                step, key, m_dp[key], m_1[key])
