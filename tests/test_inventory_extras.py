"""LPC / SSML / spectral tilt-envelope handler tests."""

import numpy as np
import pytest

from speechflow_tpu.data.core.datasample import SpectrogramDataSample, TTSDataSample
from speechflow_tpu.io import AudioChunk


def _ds(rng, sr=24000, dur=1.0):
    t = np.arange(int(sr * dur)) / sr
    wav = (0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.normal(size=len(t))).astype(np.float32)
    ds = SpectrogramDataSample(audio_chunk=AudioChunk(data=wav, sr=sr))
    from speechflow_tpu.data.processors.spectral import magnitude

    return magnitude(ds, n_fft=1024, hop_len=256)


def test_lpc_handlers(rng):
    from speechflow_tpu.data.processors.lpc import lpc, lpc_decompose, lpc_from_spectrogram

    ds = _ds(rng)
    ds = lpc(ds, order=12)
    feat = ds.additional["lpc_feat"]
    assert feat.shape[1] == 12 and np.isfinite(feat).all()
    # LPC of a (noisy) periodic signal: negative first coefficient
    assert feat[:, 0].mean() < -0.1
    ds = lpc_from_spectrogram(ds, order=8)
    assert ds.additional["lpc_feat"].shape[1] == 8
    ds = lpc_decompose(ds, order=12)
    res = ds.additional["lpc_residual"]
    assert np.isfinite(res).all() and (res >= 0).all()


def test_spectral_tilt_envelope(rng):
    from speechflow_tpu.data.processors.spectral import spectral_envelope, spectral_tilt

    ds = _ds(rng)
    ds = spectral_tilt(ds)
    tilt = ds.additional["spectral_tilt"]
    assert tilt.shape[0] == ds.magnitude.shape[0] and np.isfinite(tilt).all()
    ds = spectral_envelope(ds, n_bins=40)
    env = ds.additional["spectral_envelope"]
    assert env.shape == (ds.magnitude.shape[0], 40)
    assert 0.0 <= env.min() and env.max() <= 1.0 + 1e-6


def test_ssml_parse_and_modifiers():
    from speechflow_tpu.data.processors.ssml import apply_ssml_modifiers, parse_ssml

    text = 'Hello <prosody pitch="+20%" rate="slow">brave new</prosody> world'
    plain, words = parse_ssml(text)
    assert plain == "Hello brave new world"
    assert words[1][1]["pitch"] == pytest.approx(1.2)
    assert words[1][1]["rate"] == pytest.approx(0.8)
    assert words[0][1] == {} and words[3][1] == {}

    ds = TTSDataSample(transcription=np.arange(8, dtype=np.int32),
                       word_lengths=np.asarray([2, 2, 2, 2], np.int32))
    ds.additional["ssml"] = words
    ds = apply_ssml_modifiers(ds)
    pm = ds.additional["pitch_modifier"]
    assert pm[:2].tolist() == [1.0, 1.0]
    assert pm[2:6].tolist() == pytest.approx([1.2] * 4)
    rm = ds.additional["rate_modifier"]
    assert rm[2:6].tolist() == pytest.approx([0.8] * 4)
