"""Host (numpy) and device (jnp) DSP implementations must agree exactly:
features computed by CPU workers (dump cache) and on-device must be
interchangeable."""

import jax.numpy as jnp
import numpy as np

from speechflow_tpu import ops
from speechflow_tpu.data.processors import np_dsp


def test_magnitude_parity(rng):
    wav = rng.normal(size=12000).astype(np.float32) * 0.3
    a = np_dsp.magnitude_np(wav, 1024, 256)
    b = np.asarray(ops.magnitude(jnp.asarray(wav)[None], 1024, 256))[0]
    assert a.shape == b.shape
    assert np.abs(a - b).max() / np.abs(a).max() < 1e-4


def test_mel_chain_parity(rng):
    wav = rng.normal(size=12000).astype(np.float32) * 0.3
    a = np_dsp.normalize_mel_np(np_dsp.amp_to_db_np(
        np_dsp.linear_to_mel_np(np_dsp.magnitude_np(wav, 1024, 256), 24000, 80)))
    mag = ops.magnitude(jnp.asarray(wav)[None], 1024, 256)
    b = np.asarray(ops.normalize_mel(ops.amp_to_db(ops.linear_to_mel(mag, 24000, 80))))[0]
    assert np.abs(a - b).max() < 1e-3


def test_yin_parity():
    sr = 24000
    t = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 196.0 * t)).astype(np.float32)
    a = np_dsp.yin_f0_np(wav, sr, 256)
    b = np.asarray(ops.yin_f0(jnp.asarray(wav)[None], sr, 256))[0]
    assert a.shape == b.shape
    # voicing decisions identical on a clean tone; values within interpolation noise
    assert ((a > 0) == (b > 0)).mean() > 0.98
    both = (a > 0) & (b > 0)
    assert np.abs(a[both] - b[both]).max() < 1.0


def test_energy_flatness_parity(rng):
    mag = np.abs(rng.normal(size=(40, 513)).astype(np.float32))
    assert np.allclose(np_dsp.energy_np(mag), np.asarray(ops.energy(jnp.asarray(mag))), atol=1e-4)
    assert np.allclose(
        np_dsp.spectral_flatness_np(mag), np.asarray(ops.spectral_flatness(jnp.asarray(mag))), atol=1e-5
    )
