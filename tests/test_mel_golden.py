"""Golden mel-parity test — the BASELINE.json north star enforced by CI.

tests/data/mel_golden_reference.npz was produced by an independent oracle
(tests/tools/make_mel_golden.py: torch.stft + float64 slaney filterbank from
librosa's published formula) running the reference MelProcessor chain
(spectrogram_processors.py: magnitude -> linear_to_mel -> amp_to_db ->
normalize, production 24 kHz params) on a committed reference wav. Both the
device (ops.*) and host (np_dsp.*) paths must reproduce it to <1e-3 L1.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from speechflow_tpu import ops
from speechflow_tpu.data.processors import np_dsp

GOLDEN = Path(__file__).parent / "data" / "mel_golden_reference.npz"


@pytest.fixture(scope="module")
def golden():
    z = np.load(GOLDEN)
    return {k: z[k] for k in z.files}


def test_golden_params(golden):
    sr, n_fft, hop, win, n_mels = golden["params"]
    assert (sr, n_fft, hop, win, n_mels) == (24000, 1024, 256, 1024, 100)
    assert abs(float(golden["min_level_db"]) - np.log(1e-5)) < 1e-9


def test_np_dsp_matches_reference_chain(golden):
    wav = golden["wav"]
    mag = np_dsp.magnitude_np(wav, 1024, 256, 1024)
    assert mag.shape == golden["magnitude"].shape
    assert np.abs(mag - golden["magnitude"]).max() < 2e-4

    energy = np_dsp.energy_np(mag)
    assert np.abs(energy - golden["energy"]).max() / golden["energy"].max() < 1e-4

    mel_db = np_dsp.amp_to_db_np(np_dsp.linear_to_mel_np(mag, 24000, 100))
    assert np.abs(mel_db - golden["mel_db"]).mean() < 1e-3, "mel L1 vs reference oracle"

    mel_norm = np_dsp.normalize_mel_np(mel_db)
    assert np.abs(mel_norm - golden["mel_norm"]).mean() < 1e-3


def test_ops_matches_reference_chain(golden):
    wav = jnp.asarray(golden["wav"])[None]
    mag = ops.magnitude(wav, 1024, 256, 1024)
    mel_db = ops.amp_to_db(ops.linear_to_mel(mag, 24000, 100))
    mel_norm = np.asarray(ops.normalize_mel(mel_db))[0]
    assert mel_norm.shape == golden["mel_norm"].shape
    assert np.abs(np.asarray(mag)[0] - golden["magnitude"]).max() < 2e-3
    assert np.abs(np.asarray(mel_db)[0] - golden["mel_db"]).mean() < 1e-3
    assert np.abs(mel_norm - golden["mel_norm"]).mean() < 1e-3, "mel L1 vs reference oracle (device path)"


def test_denormalize_roundtrip(golden):
    back = np_dsp.denormalize_mel_np(golden["mel_norm"])
    clipped_golden = np.maximum(golden["mel_db"], float(golden["min_level_db"]))
    assert np.abs(back - clipped_golden).max() < 1e-3
