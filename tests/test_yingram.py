"""Yingram pitch representation (reference: PitchProcessor method='yingram',
spectrogram_processors.py:793-813 + algorithms/audio_processing/yin_image.py).

The image is a midi-scale sampled CMNDF: low values mark periodicity at that
bin's pitch. Tests pin (1) host/device parity, (2) the dip lands on the true
midi bin for pure tones and harmonic complexes, (3) the handler emits a 2-D
pitch feature aligned to mel frames and clipped to [0, 4].
"""

import jax.numpy as jnp
import numpy as np
import pytest

from speechflow_tpu.data.processors import np_dsp
from speechflow_tpu.ops import yingram
from speechflow_tpu.ops.pitch import lag_to_midi, yingram_midi_range

SR = 24000
HOP = 256


def tone(freq, dur_s=0.5, sr=SR, harmonics=1):
    t = np.arange(int(dur_s * sr)) / sr
    wav = sum((0.5 ** k) * np.sin(2 * np.pi * freq * (k + 1) * t)
              for k in range(harmonics))
    return (0.5 * wav / np.abs(wav).max()).astype(np.float32)


def midi_of(freq):
    return 12 * np.log2(freq / 440.0) + 69


def bin_to_midi(idx, sr=SR, bins=20):
    mmin, _ = yingram_midi_range(sr, 22, 2047)
    return mmin + idx / bins


def estimate_midi(frame, thresh=0.15):
    """Pitch decode from one yingram frame: the CMNDF dips at the period and
    all its multiples (= lower midi), so the true pitch is the HIGHEST-midi
    deep trough (YIN's smallest-lag-trough rule on the midi axis)."""
    deep = np.where(frame < thresh)[0]
    assert len(deep), "no deep trough in frame"
    hi = deep.max()
    # refine to the local minimum of that trough
    lo = hi
    while lo > 0 and frame[lo - 1] < thresh:
        lo -= 1
    return bin_to_midi(lo + int(np.argmin(frame[lo:hi + 1])))


def test_host_device_parity():
    wav = tone(220.0, harmonics=3)
    host = np_dsp.yingram_np(wav, SR, HOP)
    dev = np.asarray(yingram(jnp.asarray(wav), SR, HOP))
    assert host.shape == dev.shape == (1 + len(wav) // HOP,
                                       host.shape[1])
    assert np.abs(host - dev).max() < 1e-3


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0])
def test_pure_tone_dip_at_true_midi(freq):
    img = np_dsp.yingram_np(tone(freq), SR, HOP)
    mid = img[img.shape[0] // 2]  # steady-state frame
    est = estimate_midi(mid)
    assert abs(est - midi_of(freq)) < 0.5, (est, midi_of(freq))


def test_harmonic_complex_dips_at_fundamental_not_octave():
    f0 = 165.0
    img = np_dsp.yingram_np(tone(f0, harmonics=5), SR, HOP)
    mid = img[img.shape[0] // 2]
    mmin, _ = yingram_midi_range(SR, 22, 2047)
    bins = 20

    def val_at(midi):
        return float(mid[int(round((midi - mmin) * bins))])

    true_midi = midi_of(f0)
    # CMNDF at the true pitch must be a deep dip, and deeper than the
    # octave-above bin (no octave-up error in the representation)
    assert val_at(true_midi) < 0.2
    assert val_at(true_midi) < val_at(true_midi + 12.0)


def test_noise_has_no_deep_dip():
    rng = np.random.default_rng(0)
    wav = (0.3 * rng.standard_normal(SR // 2)).astype(np.float32)
    img = np_dsp.yingram_np(wav, SR, HOP)
    # a pure tone's trough reads ~1e-4; noise never gets near that
    assert float(img[img.shape[0] // 2].min()) > 0.02


def test_pitch_handler_yingram(tmp_path):
    from speechflow_tpu.data.processors.spectral import (magnitude as mag_h,
                                                          pitch)
    from speechflow_tpu.data.core.datasample import SpectrogramDataSample
    from speechflow_tpu.io import AudioChunk

    wav = tone(220.0, dur_s=0.4)
    ds = SpectrogramDataSample(
        audio_chunk=AudioChunk(data=wav, sr=SR))
    ds = mag_h(ds, n_fft=1024, hop_len=HOP)
    ds = pitch(ds, method="yingram")
    assert ds.pitch.ndim == 2
    assert ds.pitch.shape[0] == ds.magnitude.shape[0]
    assert 0.0 <= ds.pitch.min() and ds.pitch.max() <= 4.0
    # the tone's bin is a dip in every steady frame
    frame = ds.pitch[ds.pitch.shape[0] // 2]
    est = estimate_midi(frame)
    assert abs(est - midi_of(220.0)) < 0.75
