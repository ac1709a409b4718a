"""Device-side DSP & alignment kernels (JAX/XLA/Pallas).

This package replaces the reference's per-utterance NumPy/librosa/pyworld/numba
hot loops (speechflow/data_pipeline/datasample_processors/spectrogram_processors.py,
tts/forced_alignment/model/utils.py) with batched, fixed-shape, jit-compiled
TPU kernels.
"""

from speechflow_tpu.ops.stft import hann_window, frame_signal, stft, istft, overlap_add, magnitude
from speechflow_tpu.ops.mel import (
    mel_filterbank,
    linear_to_mel,
    mel_to_linear,
    amp_to_db,
    db_to_amp,
    normalize_mel,
    denormalize_mel,
    MIN_LEVEL_DB,
)
from speechflow_tpu.ops.signal import (
    preemphasis,
    deemphasis,
    energy,
    spectral_flatness,
    mu_law_encode,
    mu_law_decode,
    rms_normalize,
    dither,
)
from speechflow_tpu.ops.pitch import yin_f0, yingram
from speechflow_tpu.ops.length_regulator import length_regulate_hard, length_regulate_soft, duration_attention
from speechflow_tpu.ops.mas import maximum_path
from speechflow_tpu.ops.cqt import cqt, cqt_frequencies

__all__ = [
    "hann_window", "frame_signal", "stft", "istft", "overlap_add", "magnitude",
    "mel_filterbank", "linear_to_mel", "mel_to_linear", "amp_to_db", "db_to_amp",
    "normalize_mel", "denormalize_mel", "MIN_LEVEL_DB",
    "preemphasis", "deemphasis", "energy", "spectral_flatness",
    "mu_law_encode", "mu_law_decode", "rms_normalize", "dither",
    "yin_f0", "yingram",
    "length_regulate_hard", "length_regulate_soft", "duration_attention",
    "maximum_path",
]
