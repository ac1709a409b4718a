"""Trainable CREPE-class pitch tracker (VERDICT r3 next-step #9).

The reference offers pyworld / torchcrepe / yingram pitch methods
(spectrogram_processors.py:693-699); the framework's third method is a tiny
conv tracker trained on synthetic harmonic frames (zero-egress).  Tests pin:
the output contract (framing parity with yin_f0), synthetic-tone accuracy
after a short training budget, unvoiced rejection, checkpoint round-trip +
the data-pipeline handler path, and cross-method parity against YIN on real
corpus audio."""

import numpy as np
import pytest
from tests.paths import MINI_SEGS

MINI = f"{MINI_SEGS}"


@pytest.fixture(scope="module")
def trained_crepe():
    from speechflow_tpu.models.pitch import CrepeParams, train_crepe

    # reduced-budget model: enough for the parity tolerances below
    return train_crepe(CrepeParams(), steps=400, batch=64, seed=0)


def _harmonic(f0: float, sr: int, dur: float = 1.0, n_harm: int = 10):
    t = np.arange(int(sr * dur)) / sr
    sig = sum(k ** -1.0 * np.sin(2 * np.pi * k * f0 * t)
              for k in range(1, n_harm + 1))
    return (sig / np.abs(sig).max()).astype(np.float32)


def test_untrained_contract():
    """Framing parity with yin_f0: 1 + T // hop frames, batch preserved."""
    import jax.numpy as jnp

    from flax import nnx

    from speechflow_tpu.models.pitch import CrepeF0, CrepeParams, crepe_f0

    model = CrepeF0(CrepeParams(), rngs=nnx.Rngs(0))
    wav = jnp.zeros((2, 24000), jnp.float32)
    f0 = np.asarray(crepe_f0(model, wav, sr=24000, hop_length=256))
    assert f0.shape == (2, 1 + 24000 // 256)
    with pytest.raises(ValueError):
        crepe_f0(model, wav, sr=16000)


@pytest.mark.slow
def test_synthetic_tone_accuracy(trained_crepe):
    import jax.numpy as jnp

    from speechflow_tpu.models.pitch import crepe_f0

    errs = []
    for f0 in (80.0, 150.0, 220.0, 440.0):
        sig = _harmonic(f0, 24000)
        est = np.asarray(crepe_f0(trained_crepe, jnp.asarray(sig[None]),
                                  sr=24000))[0]
        voiced = est[est > 0]
        assert voiced.size > 0.8 * est.size, f"tone {f0} mostly unvoiced"
        errs.append(abs(float(np.median(voiced)) - f0) / f0)
    assert float(np.median(errs)) < 0.03, f"median rel err {errs}"

    # unvoiced rejection: white noise must be mostly unvoiced
    noise = (np.random.default_rng(0).standard_normal(24000) * 0.1).astype(np.float32)
    est = np.asarray(crepe_f0(trained_crepe, jnp.asarray(noise[None]), sr=24000))[0]
    assert float((est > 0).mean()) < 0.2


@pytest.mark.slow
def test_cross_method_parity_on_corpus(trained_crepe, tmp_path):
    """CREPE vs YIN on real corpus speech: the two independent methods must
    agree on the majority of mutually-voiced frames (reference parity anchor:
    the pitch-method choice is a config knob, spectrogram_processors.py:693)."""
    import glob

    import jax.numpy as jnp

    from speechflow_tpu.data.processors.np_dsp import yin_f0_np
    from speechflow_tpu.io.audio import AudioChunk
    from speechflow_tpu.models.pitch import crepe_f0

    wavs = sorted(glob.glob(f"{MINI}/EN/LJSpeech/000/*.wav"))
    if not wavs:
        pytest.skip("reference mini dataset unavailable")
    rel_diffs = []
    for p in wavs[:3]:
        ac = AudioChunk(file_path=p).load()
        wav = ac.waveform.astype(np.float32)
        yin = yin_f0_np(wav, ac.sr, 256, 2048, 80.0, 880.0, 0.2)
        crepe = np.asarray(crepe_f0(trained_crepe, jnp.asarray(wav[None]),
                                    sr=ac.sr))[0][: len(yin)]
        yin = yin[: len(crepe)]
        both = (yin > 0) & (crepe > 0)
        assert both.mean() > 0.2, "methods share too few voiced frames"
        rel = np.abs(crepe[both] - yin[both]) / yin[both]
        # octave errors differ between methods; compare the non-octave mass
        rel_diffs.append(float(np.median(rel)))
    assert float(np.median(rel_diffs)) < 0.1, rel_diffs

    # handler path: method="crepe" through the data pipeline handler
    from speechflow_tpu.data.core.datasample import SpectrogramDataSample
    from speechflow_tpu.data.processors.spectral import pitch
    from speechflow_tpu.models.pitch import save_crepe

    ckpt = tmp_path / "crepe.pkl"
    save_crepe(trained_crepe, ckpt)
    ac = AudioChunk(file_path=wavs[0]).load()
    ds = SpectrogramDataSample(audio_chunk=ac)
    ds = pitch(ds, method="crepe", crepe_ckpt=str(ckpt))
    assert ds.pitch is not None and ds.pitch.ndim == 1
    assert (ds.pitch >= 0).all() and (ds.pitch > 0).any()
    with pytest.raises(ValueError):
        pitch(SpectrogramDataSample(audio_chunk=ac), method="crepe")
    with pytest.raises(ValueError):
        pitch(SpectrogramDataSample(audio_chunk=ac), method="nope")
