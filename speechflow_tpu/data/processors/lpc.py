"""LPC features (reference: LPCProcessor, spectrogram_processors.py:878 +
algorithms/audio_processing/lpc_from_{signal,spectrogram}.py).

LPC coefficients per frame via the autocorrelation method
(Levinson-Durbin), computed from the waveform or from a (mel/linear)
spectrogram's autocorrelation (inverse FFT of the power spectrum), plus
``lpc_decompose`` splitting the signal into LPC envelope + residual.
"""

from __future__ import annotations

import typing as tp

import numpy as np

from speechflow_tpu.data.core.datasample import SpectrogramDataSample
from speechflow_tpu.data.processors import handler
from speechflow_tpu.data.processors.np_dsp import _frame_np, hann_window_np

__all__ = ["levinson_durbin", "lpc_from_signal", "lpc_from_magnitude"]


def levinson_durbin(r: np.ndarray, order: int) -> np.ndarray:
    """Autocorrelation (..., order+1) -> LPC coefficients (..., order)."""
    r = np.atleast_2d(r)
    n = r.shape[0]
    a = np.zeros((n, order + 1), np.float64)
    a[:, 0] = 1.0
    err = r[:, 0].copy()
    err = np.maximum(err, 1e-9)
    for i in range(1, order + 1):
        acc = r[:, i].copy()
        for j in range(1, i):
            acc += a[:, j] * r[:, i - j]
        k = -acc / err
        a_new = a.copy()
        for j in range(1, i):
            a_new[:, j] = a[:, j] + k * a[:, i - j]
        a_new[:, i] = k
        a = a_new
        err = err * (1.0 - k * k)
        err = np.maximum(err, 1e-9)
    return a[:, 1:].astype(np.float32)


def lpc_from_signal(wav: np.ndarray, order: int = 16, frame_length: int = 1024,
                    hop: int = 256) -> np.ndarray:
    pad = frame_length // 2
    xp = np.pad(wav.astype(np.float64), (pad, pad), mode="reflect")
    frames = _frame_np(xp, frame_length, hop) * hann_window_np(frame_length)
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    r = np.fft.irfft(spec, axis=-1)[:, : order + 1]
    return levinson_durbin(r, order)


def lpc_from_magnitude(mag: np.ndarray, order: int = 16) -> np.ndarray:
    """(T, n_bins) magnitude -> (T, order) LPC via spectral autocorrelation."""
    power = mag.astype(np.float64) ** 2
    # symmetric spectrum -> autocorrelation by inverse rFFT
    r = np.fft.irfft(power, axis=-1)[:, : order + 1]
    return levinson_durbin(r, order)


@handler(inputs={"audio_chunk"}, outputs={"lpc_feat"})
def lpc(ds: SpectrogramDataSample, order: int = 16,
        frame_length: int = 1024) -> SpectrogramDataSample:
    hop = ds.get_param_val("hop_len", ds.hop_len or 256)
    feats = lpc_from_signal(ds.audio_chunk.waveform, order, frame_length, hop)
    if ds.magnitude is not None:
        feats = feats[: ds.magnitude.shape[0]]
    ds.additional["lpc_feat"] = feats
    return ds


@handler(inputs={"magnitude"}, outputs={"lpc_feat"})
def lpc_from_spectrogram(ds: SpectrogramDataSample, order: int = 16) -> SpectrogramDataSample:
    ds.additional["lpc_feat"] = lpc_from_magnitude(ds.magnitude, order)
    return ds


@handler(inputs={"audio_chunk"}, outputs={"lpc_residual"})
def lpc_decompose(ds: SpectrogramDataSample, order: int = 16,
                  frame_length: int = 1024) -> SpectrogramDataSample:
    """Signal = LPC-predicted + residual; stores per-frame residual energy."""
    hop = ds.get_param_val("hop_len", ds.hop_len or 256)
    wav = ds.audio_chunk.waveform.astype(np.float64)
    coefs = lpc_from_signal(wav, order, frame_length, hop)
    pad = frame_length // 2
    xp = np.pad(wav, (pad, pad), mode="reflect")
    frames = _frame_np(xp, frame_length, hop)
    resid = np.zeros(len(coefs), np.float32)
    for t in range(len(coefs)):
        fr = frames[t]
        pred = np.zeros_like(fr)
        for j in range(order):
            pred[j + 1:] -= coefs[t, j] * fr[: len(fr) - j - 1]
        resid[t] = float(np.sqrt(np.mean((fr - pred) ** 2) + 1e-12))
    ds.additional["lpc_residual"] = resid
    return ds
