"""1D-signal contour handler tests (signal_enhancement / clip / normalize /
average_by_time / pitch_to_wavelet / timedim_interpolation / store_field) and
the model's average-embedding conditioning + MixStyle.

Reference capabilities: spectrogram_processors.py:1004-1339,
audio_processors.py:468, auxiliary.py:19, embedding_calculator.py:123,
modules/common/mixstyle.py.
"""

import numpy as np
import pytest

from speechflow_tpu.data.core.datasample import SpectrogramDataSample, TTSDataSample
from speechflow_tpu.data.processors.signal1d import (
    average_by_time,
    clip,
    normalize,
    pitch_to_wavelet,
    signal_enhancement,
    store_field,
    timedim_interpolation,
)
from speechflow_tpu.io import AudioChunk
from speechflow_tpu.io.timestamps import Timestamps


def _pitchy_ds(pitch):
    return SpectrogramDataSample(pitch=np.asarray(pitch, np.float32))


# -------------------------------------------------------------- enhancement


def test_signal_enhancement_interpolates_zeros():
    ds = _pitchy_ds([100.0, 0.0, 0.0, 0.0, 200.0, 0.0, 220.0])
    ds = signal_enhancement(ds, "pitch", interpolate_zeros=True)
    assert (ds.pitch > 0).all()
    np.testing.assert_allclose(ds.pitch[1:4], [125.0, 150.0, 175.0])
    np.testing.assert_allclose(ds.pitch[5], 210.0)


def test_signal_enhancement_max_zero_interval_keeps_long_gaps():
    vals = [100.0] + [0.0] * 10 + [200.0, 0.0, 220.0]
    ds = _pitchy_ds(vals)
    ds = signal_enhancement(ds, "pitch", interpolate_zeros=True, max_zero_interval=4)
    assert (ds.pitch[2:10] == 0).all()      # long gap stays unvoiced
    assert ds.pitch[12] > 0                 # short gap interpolated


def test_signal_enhancement_smooth_and_pause_zeroing():
    rng = np.random.default_rng(0)
    pitch = 200 + 20 * rng.normal(size=100).astype(np.float32)
    sr, hop = 24000, 256
    frames_per_s = sr / hop
    ds = TTSDataSample(
        pitch=pitch.copy(), sample_rate=sr, hop_len=hop,
        phonemes=["a", "<SIL>", "b"],
        phoneme_timestamps=Timestamps(np.array([
            [0.0, 0.3], [0.3, 0.6], [0.6, 100 / frames_per_s]])),
    )
    ds = signal_enhancement(ds, "pitch", smooth=True, set_zero_in_pauses=True)
    assert len(ds.pitch) == 100
    # smoothing reduces frame-to-frame jitter
    assert np.abs(np.diff(ds.pitch[:int(0.3 * frames_per_s)])).mean() \
        < np.abs(np.diff(pitch[:int(0.3 * frames_per_s)])).mean()
    a, b = int(0.3 * frames_per_s), int(0.6 * frames_per_s)
    assert (ds.pitch[a:b] == 0).all()


# -------------------------------------------------------------- clip / normalize


def test_clip_handler():
    ds = _pitchy_ds([50.0, 100.0, 900.0])
    ds = clip(ds, "pitch", min_value=80.0, max_value=600.0)
    np.testing.assert_allclose(ds.pitch, [80.0, 100.0, 600.0])


def test_normalize_sample_minmax_records_ranges():
    ds = _pitchy_ds([100.0, 150.0, 200.0])
    ds.energy = np.array([1.0, 2.0, 3.0], np.float32)
    ds = normalize(ds, ["pitch", "energy"], normalize_by="sample")
    assert ds.pitch.min() == 0.0 and ds.pitch.max() == 1.0
    lo, hi, span = ds.ranges["pitch"]
    assert lo == 100.0 and hi == 200.0 and span == 100.0
    # invertibility: x = normed * span + lo
    np.testing.assert_allclose(ds.pitch * span + lo, [100.0, 150.0, 200.0])


def test_normalize_sample_ignores_unvoiced_pitch_zeros():
    ds = _pitchy_ds([0.0, 100.0, 200.0, 0.0])
    ds = normalize(ds, "pitch", normalize_by="sample")
    lo, hi, _ = ds.ranges["pitch"]
    assert lo == 100.0 and hi == 200.0  # zeros excluded from the range


def test_normalize_by_speaker_uses_statistics_range():
    from speechflow_tpu.data.processors.singletons import StatisticsRange
    from speechflow_tpu.data.core.singleton import Singleton

    Singleton.clear()
    try:
        sr = StatisticsRange()
        sr.ranges = {"spk0": {"pitch": (100.0, 300.0, 180.0, 40.0)}}
        ds = _pitchy_ds([100.0, 200.0, 300.0])
        ds.speaker_name = "spk0"
        ds = normalize(ds, "pitch", normalize_by="speaker", ranges=sr)
        np.testing.assert_allclose(ds.pitch, [0.0, 0.5, 1.0])
    finally:
        Singleton.clear()


def test_normalize_znorm():
    rng = np.random.default_rng(1)
    ds = _pitchy_ds(200 + 25 * rng.normal(size=500))
    ds = normalize(ds, "pitch", normalize_by="sample", method="z-norm")
    # z-norm maps mean -> 0 and scales by 4*std: values land in ~[-1, 1]
    assert abs(ds.pitch.mean()) < 0.05
    assert np.abs(ds.pitch).max() < 1.5


def test_normalize_speaker_requires_singleton():
    ds = _pitchy_ds([1.0, 2.0])
    with pytest.raises(ValueError):
        normalize(ds, "pitch", normalize_by="speaker", ranges=None)


# -------------------------------------------------------------- averages


def test_average_by_time_and_rate():
    wav = np.zeros(48000, np.float32)
    ds = TTSDataSample(
        audio_chunk=AudioChunk(data=wav, sr=24000),
        pitch=np.array([0.0, 100.0, 200.0, 300.0], np.float32),
        energy=np.array([1.0, 2.0, 3.0, 100.0], np.float32),
        transcription=np.arange(10),
    )
    ds = average_by_time(ds, ["pitch", "energy", "rate"],
                         use_quantile=True, quantile=0.75, min_value=0.0)
    assert set(ds.averages) == {"pitch", "energy", "rate"}
    assert 100.0 <= ds.averages["pitch"] <= 300.0
    # quantile clipping tames the 100.0 energy outlier
    assert ds.averages["energy"] < 40.0
    assert ds.averages["rate"] == pytest.approx(10 / 2.0)


# -------------------------------------------------------------- wavelet


def test_pitch_to_wavelet_shape_and_numerics():
    t = np.linspace(0, 4 * np.pi, 200)
    ds = _pitchy_ds(200 + 50 * np.sin(t))
    ds = pitch_to_wavelet(ds, num_bands=16)
    assert ds.pitch.shape == (200, 16)
    assert np.isfinite(ds.pitch).all()
    # narrow scales track the oscillation; the DC offset cancels (ricker has
    # zero mean), so the response is dominated by the sine component
    assert np.abs(ds.pitch).max() > 1.0
    ds0 = _pitchy_ds(np.zeros(50))
    assert (pitch_to_wavelet(ds0, num_bands=4).pitch == 0).all()


# -------------------------------------------------------------- interpolation


def test_timedim_interpolation_matches_mel_grid():
    ds = SpectrogramDataSample(
        mel=np.zeros((100, 80), np.float32),
        pitch=np.linspace(0.0, 1.0, 150).astype(np.float32),
        ssl_feat=np.linspace(0.0, 1.0, 75)[:, None].repeat(8, 1).astype(np.float32),
    )
    ds = timedim_interpolation(ds, ["pitch", "ssl_feat"], shape_as="mel")
    assert ds.pitch.shape == (100,)
    assert ds.ssl_feat.shape == (100, 8)
    np.testing.assert_allclose(ds.pitch[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(ds.pitch[-1], 1.0, atol=1e-6)
    assert (np.diff(ds.pitch) > 0).all()  # monotone ramp survives resampling


def test_store_field():
    ds = SpectrogramDataSample(speaker_emb=np.ones(4, np.float32))
    ds = store_field(ds, key="speaker_emb", as_key="ecapa_emb")
    ds.speaker_emb *= 2.0
    np.testing.assert_allclose(ds.additional["ecapa_emb"], np.ones(4))


# -------------------------------------------------------------- model conditioning


def _tiny_params(**kw):
    from speechflow_tpu.models.tts.model import ParallelTTSParams

    return ParallelTTSParams(
        n_symbols=20, n_speakers=2, n_mels=16, token_emb_dim=16,
        speaker_emb_dim=8, encoder_dim=16, encoder_layers=1, encoder_heads=2,
        decoder_dim=16, decoder_layers=1, postnet_dim=16, postnet_layers=1,
        variances=({"name": "durations"},), **kw)


def _tiny_inputs(averages=None):
    import jax.numpy as jnp

    from speechflow_tpu.models.tts.data_types import TTSForwardInput

    b, n, t = 2, 6, 12
    return TTSForwardInput(
        transcription=jnp.ones((b, n), jnp.int32),
        transcription_lengths=jnp.array([n, n - 2]),
        speaker_id=jnp.array([0, 1]),
        durations=jnp.full((b, n), t / n, jnp.float32),
        mel=jnp.zeros((b, t, 16)), mel_lengths=jnp.array([t, t - 4]),
        averages=averages,
    )


@pytest.mark.parametrize("use_sources", [False, True])
def test_average_embedding_conditioning(use_sources):
    import jax.numpy as jnp
    from flax import nnx

    from speechflow_tpu.models.tts.model import ParallelTTSModel

    avg_cfg = {"pitch": {"interval": (50.0, 500.0), "n_bins": 16, "emb_dim": 8},
               "rate": {"interval": (0.0, 30.0), "n_bins": 8, "emb_dim": 4}}
    kw = dict(use_average_emb=True, averages=avg_cfg)
    if use_sources:
        kw["condition_sources"] = ("speaker", "average_pitch", "average_rate")
    model = ParallelTTSModel(_tiny_params(**kw), rngs=nnx.Rngs(0))
    averages = {"pitch": jnp.array([200.0, 400.0]), "rate": jnp.array([12.0, 15.0])}
    out = model(_tiny_inputs(averages), training=False)
    assert out.spectrogram.shape[-1] == 16
    assert np.isfinite(np.asarray(out.spectrogram)).all()

    # different averages must change the conditioning (and thus the output)
    out2 = model(_tiny_inputs({"pitch": jnp.array([60.0, 60.0]),
                               "rate": jnp.array([1.0, 1.0])}), training=False)
    assert np.abs(np.asarray(out.spectrogram) - np.asarray(out2.spectrogram)).max() > 1e-6

    # raw-text inference: no averages -> neutral midpoint fallback still runs
    out3 = model(_tiny_inputs(None), training=False)
    assert np.isfinite(np.asarray(out3.spectrogram)).all()


def test_mixstyle_mixes_in_training_identity_in_eval():
    import jax.numpy as jnp
    from flax import nnx

    from speechflow_tpu.models.tts.common import MixStyle

    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 10, 8)), jnp.float32)
    ms = MixStyle(p=1.0, alpha=0.1, rngs=nnx.Rngs(42))
    y = ms(x, training=True)
    assert y.shape == x.shape
    assert np.abs(np.asarray(y - x)).max() > 1e-4
    np.testing.assert_array_equal(np.asarray(ms(x, training=False)), np.asarray(x))


# -------------------------------------------------------------- pipeline integration


@pytest.mark.slow
def test_pipeline_with_contour_handlers(tmp_path):
    """Flagship config + enhancement/normalize/average_by_time, run the way
    the reference does: a dump pass computes per-speaker ranges.json, then
    the training pipeline normalizes per speaker via the injected
    StatisticsRange and collates the per-utterance averages."""
    import json
    from pathlib import Path

    from speechflow_tpu.data.core.components import DataPipeline
    from speechflow_tpu.io import Config
    from speechflow_tpu.scripts.dump import compute_ranges

    cfg_path = Path(__file__).parent.parent / "configs" / "tts_data_24khz.yml"
    cfg = Config.create_from_file(cfg_path, value_select=["debug"])
    pipe = list(cfg.get_path("preproc.pipe"))
    i = pipe.index("aggregate_pitch")
    pipe[i:i] = ["signal_enhancement", "average_by_time", "normalize"]
    cfg.set_path("preproc.pipe", pipe)
    cfg.set_path("preproc.pipe_cfg.signal_enhancement",
                 {"attributes": "pitch", "interpolate_zeros": True, "smooth": True})
    cfg.set_path("preproc.pipe_cfg.average_by_time",
                 {"attributes": ["pitch", "energy", "rate"], "use_quantile": True})
    cfg.set_path("preproc.pipe_cfg.normalize",
                 {"attributes": ["pitch", "energy"], "normalize_by": "speaker"})

    # dump pass: ranges from the processed (pre-normalize) samples
    dp0 = DataPipeline(Config(cfg)).init_components()
    batch0 = dp0["train"].sample_batch(4)
    ranges = compute_ranges(batch0.data_samples)
    ranges_file = tmp_path / "ranges.json"
    ranges_file.write_text(json.dumps(
        {spk: {k: list(map(float, v)) for k, v in feats.items()}
         for spk, feats in ranges.items()}))

    cfg.set_path("singleton_handlers", {
        "SpeakerIDSetter": {}, "DatasetStatistics": {}, "PhonemeStatistics": {},
        "StatisticsRange": {"ranges_file": str(ranges_file)},
    })
    dp = DataPipeline(cfg).init_components()
    batch = dp["train"].sample_batch(4)
    c = batch.collated_samples
    assert c.averages is not None and "rate" in c.averages
    assert c.averages["pitch"].shape == (batch.size,)
    assert (c.averages["pitch"] > 0).all()
    # per-speaker normalized contours live near [0, 1] — the range is the
    # 1st/99th quantile of a small dump batch, so moderate overshoot is
    # expected; the point is the raw ~100-600 Hz scale is gone
    assert c.pitch.min() >= -1.0 and c.pitch.max() <= 2.5
    for s in batch.data_samples or []:
        assert s.ranges is not None and "pitch" in s.ranges
