"""LPC / SSML / spectral tilt-envelope handler tests."""

import numpy as np
import pytest

from speechflow_tpu.data.core.datasample import SpectrogramDataSample, TTSDataSample
from speechflow_tpu.io import AudioChunk
from tests.paths import MINI_SEGS

pytestmark = pytest.mark.slow


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


def test_ssml_modifiers_through_variance_adaptor(rng):
    """SSML factors reach the model: rate_modifier scales predicted durations,
    pitch/volume modifiers scale conditioning values (SURVEY §A.1 step 3)."""
    import dataclasses

    import jax.numpy as jnp
    from flax import nnx

    from speechflow_tpu.models.tts import ParallelTTSModel, ParallelTTSParams
    from tests.test_tts_model import _inputs

    p = ParallelTTSParams.create(
        n_symbols=60, n_speakers=4, n_mels=40, encoder_dim=48, encoder_layers=1,
        decoder_dim=48, decoder_layers=1, token_emb_dim=48, speaker_emb_dim=16,
        postnet_dim=48, max_output_length=128)
    model = ParallelTTSModel(p, rngs=nnx.Rngs(0))
    base = dataclasses.replace(_inputs(rng), durations=None, mel=None,
                               mel_lengths=None, aggregate_pitch=None,
                               aggregate_energy=None)
    out_normal = model.inference(base, t_out=128)
    slow = dataclasses.replace(base, rate_modifier=jnp.full((2, 16), 0.5))
    out_slow = model.inference(slow, t_out=128)
    # rate 0.5 => durations doubled => longer outputs (capped at t_out)
    assert int(out_slow.spectrogram_lengths.sum()) > int(out_normal.spectrogram_lengths.sum())


def test_ssml_through_eval_interface(tmp_path, rng):
    """End to end: SSML text through the checkpoint interface produces
    modifier-aware inputs (slower span -> longer audio than plain text)."""
    import os

    mini = f"{MINI_SEGS}"
    if not os.path.isdir(mini):
        pytest.skip("mini dataset unavailable")
    from pathlib import Path

    from speechflow_tpu.io import Config
    from speechflow_tpu.scripts import train_tts
    from speechflow_tpu.interface import TTSEvaluationInterface, TTSOptions
    from speechflow_tpu.training import ExperimentSaver

    cfg_dir = Path(__file__).parent.parent / "configs"
    cfg = Config.create_from_file(cfg_dir / "tts_model.yml", value_select=["debug"])
    cfg.set_path("experiment.base_dir", str(tmp_path))
    cfg.set_path("trainer.max_steps", 4)
    cfg.set_path("trainer.ckpt_every", 4)
    mpath = tmp_path / "m.yml"
    cfg.to_file(mpath)
    exp = train_tts.main(["-c", str(mpath), "-cd", str(cfg_dir / "tts_data_24khz.yml"),
                          "-vs", "debug", "--data_root", mini, "--platform", "cpu"])
    iface = TTSEvaluationInterface(ExperimentSaver.get_last_checkpoint(exp))
    import numpy as np

    # the prepared inputs must carry the expanded token-level modifiers
    ctx = iface.create_context("EN", iface.get_speakers()[0])
    inputs = iface.prepare_batch(
        ['hello <prosody rate="x-slow" pitch="+20%">world</prosody> again'],
        ctx, TTSOptions(t_out=256))
    rate = np.asarray(inputs.rate_modifier)[0]
    pitch = np.asarray(inputs.pitch_modifier)[0]
    n = int(np.asarray(inputs.transcription_lengths)[0])
    # 'world' span tokens get 0.6 rate / 1.2 pitch; the rest stay 1.0.
    # Expected count comes from the interface's own tokenizer (trained G2P
    # -> phoneme count; char fallback -> 5), so the test is frontend-agnostic
    n_world = len(iface.text_processor.parser("world"))
    assert n_world >= 1
    assert (rate[:n] == 0.6).sum() == n_world
    assert (np.isclose(pitch[:n], 1.2)).sum() == n_world
    assert np.isclose(rate[:n][rate[:n] != 0.6], 1.0).all()

    # synthesis with modifiers stays finite end to end
    out = iface.synthesize('hello <prosody rate="fast">world</prosody> again',
                           lang="EN", speaker=iface.get_speakers()[0],
                           opts=TTSOptions(t_out=256))
    assert np.isfinite(np.asarray(out.after_postnet_spectrogram)).all()
