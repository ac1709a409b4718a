"""Constant-Q transform + CQT discriminator tests.

The octave-recursive device CQT (ops/cqt.py) is verified against a direct
O(T*n_bins*maxlen) implementation of the CQT definition (naive_cqt_np) and
for exact peak localization; the discriminator (reference
MultiScaleSubbandCQTDiscriminator, discriminators.py:459) is smoke-tested for
shapes and finite gradients.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tone_mix():
    sr = 24000
    t = np.arange(sr) / sr
    rng = np.random.default_rng(0)
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.3 * np.sin(2 * np.pi * 2093 * t)
           + 0.2 * np.sin(2 * np.pi * 110 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    return wav, sr


def test_cqt_matches_definition(tone_mix):
    from speechflow_tpu.ops.cqt import cqt, naive_cqt_np

    wav, sr = tone_mix
    hop, n_oct, bpo = 512, 9, 24
    dev = np.asarray(cqt(wav[None], sr, hop, n_octaves=n_oct,
                         bins_per_octave=bpo))[0]
    ref = naive_cqt_np(wav.astype(np.float64), sr, hop, n_octaves=n_oct,
                       bins_per_octave=bpo)
    T = min(dev.shape[0], ref.shape[0])
    m_dev = np.abs(dev[:T, :, 0] + 1j * dev[:T, :, 1])[4:-4]
    m_ref = np.abs(ref[:T])[4:-4]
    rel_l1 = np.abs(m_dev - m_ref).mean() / m_ref.mean()
    corr = np.corrcoef(m_dev.ravel(), m_ref.ravel())[0, 1]
    assert rel_l1 < 0.05, rel_l1       # measured 0.015
    assert corr > 0.999, corr          # measured 0.99997


def test_cqt_peak_localization(tone_mix):
    from speechflow_tpu.ops.cqt import cqt, cqt_frequencies

    wav, sr = tone_mix
    n_oct, bpo = 9, 24
    arr = np.asarray(cqt(wav[None], sr, 512, n_octaves=n_oct,
                         bins_per_octave=bpo))[0]      # (T, bins, 2)
    prof = np.sqrt((arr ** 2).sum(-1)).mean(0)
    freqs = cqt_frequencies(32.703195, n_oct * bpo, bpo)
    for f0 in (110, 440, 2093):
        k = int(np.argmin(abs(freqs - f0)))
        lo, hi = max(k - 3, 0), k + 4
        assert prof[k] >= prof[lo:hi].max() * 0.999, f0
        assert prof[k] > 10 * np.median(prof), f0


def test_cqt_hop_validation():
    from speechflow_tpu.ops.cqt import cqt

    with pytest.raises(ValueError):
        cqt(np.zeros((1, 4096), np.float32), 24000, hop_length=100)


def test_cqt_discriminator_smoke():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from speechflow_tpu.models.vocoder.discriminators import VocoderDiscriminator

    d = VocoderDiscriminator(channels=8, use_cqt=True, sample_rate=24000,
                             rngs=nnx.Rngs(1))
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 16384))
    logits, fmaps = d(wav)
    # 5 MPD + 3 CQT scales
    assert len(logits) == 8 and len(fmaps) == 8
    assert all(l.shape[0] == 2 for l in logits)

    def loss(model, w):
        lg, _ = model(w)
        return sum(jnp.mean((l - 1.0) ** 2) for l in lg)

    g = nnx.grad(loss)(d, wav)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(bool(jnp.isfinite(x).all()) for x in leaves)
