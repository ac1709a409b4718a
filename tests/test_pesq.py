"""PESQ (P.862-class, models/vocoder/pesq.py) behavioral pins.

The implementation is structure-faithful to ITU-T P.862/P.862.2 but not
bit-exact (see module docstring); these tests pin the properties that make
it usable as a vocoder validation metric: perfect on identical input,
tight monotone tracking of SNR near published PESQ-vs-AWGN values, near-floor
on total signal loss, and insensitivity to small delays / level offsets.
"""

import numpy as np
import pytest
from tests.paths import MINI_SEGS


@pytest.fixture(scope="module")
def speech():
    from speechflow_tpu.io import AudioSeg

    seg = AudioSeg.load(
        f"{MINI_SEGS}/EN/LJSpeech/000/0.TextGridStage3")
    wav = np.asarray(seg.audio_chunk.load(sr=16000).waveform, np.float64)
    return wav[: 16000 * 3]


def _awgn(wav, snr_db, seed=0):
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(len(wav))
    noise *= np.sqrt((wav ** 2).mean() / (noise ** 2).mean()) * 10 ** (-snr_db / 20)
    return wav + noise


def test_identical_is_max(speech):
    from speechflow_tpu.models.vocoder.pesq import pesq_raw, pesq_wb

    assert pesq_raw(speech, speech, 16000) == pytest.approx(4.5, abs=1e-6)
    assert pesq_wb(speech, speech, 16000) == pytest.approx(4.644, abs=0.01)


def test_monotone_in_snr(speech):
    from speechflow_tpu.models.vocoder.pesq import pesq_wb

    scores = [pesq_wb(speech, _awgn(speech, snr), 16000)
              for snr in (40, 30, 20, 10, 0)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    # ballpark of published PESQ-vs-AWGN behavior (loose: +-0.5 MOS)
    assert 3.4 < scores[0] <= 4.6      # 40 dB
    assert 1.7 < scores[2] < 2.9       # 20 dB
    assert scores[4] < 1.4             # 0 dB


def test_total_loss_is_floor(speech):
    from speechflow_tpu.models.vocoder.pesq import pesq_wb

    assert pesq_wb(speech, np.zeros_like(speech) + 1e-9, 16000) < 1.5


def test_delay_and_gain_invariance(speech):
    from speechflow_tpu.models.vocoder.pesq import pesq_wb

    delayed = np.concatenate([np.zeros(800), speech])[: len(speech)]
    assert pesq_wb(speech, delayed, 16000) > 4.4
    assert pesq_wb(speech, 0.3 * speech, 16000) > 4.4


def test_distortion_ranking(speech):
    from speechflow_tpu.models.vocoder.pesq import pesq_wb

    peak = np.abs(speech).max()
    light_clip = np.clip(speech, -0.7 * peak, 0.7 * peak)
    hard_clip = np.clip(speech, -0.2 * peak, 0.2 * peak)
    assert pesq_wb(speech, light_clip, 16000) > pesq_wb(speech, hard_clip, 16000)


def test_resampling_path(speech):
    """24 kHz input resamples internally to 16 kHz (the reference calls
    pesq at 16 kHz after its own resample, lightning_engine.py:471-475)."""
    from scipy.signal import resample_poly

    from speechflow_tpu.models.vocoder.pesq import pesq_wb

    wav24 = resample_poly(speech, 3, 2)
    assert pesq_wb(wav24, wav24, 24000) > 4.6
    assert pesq_wb(wav24, _awgn(wav24, 10, seed=1), 24000) < 2.2
