"""Batched STFT/ISTFT for TPU.

Replaces the reference's librosa/torch STFT backends
(speechflow/data_pipeline/datasample_processors/spectrogram_processors.py:115-220)
with a jit-compiled batched implementation: periodic Hann window, centered
reflect padding, rfft — numerically matching ``librosa.stft(center=True,
pad_mode="reflect")`` / ``torch.stft`` on float32 input.

Framing is a strided gather (static shapes), which XLA lowers to an efficient
windowed load; the FFT uses XLA's native FFT op. Everything is (B, T) ->
(B, n_frames, n_bins) so a whole batch is one device call.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hann_window", "frame_signal", "stft", "istft", "overlap_add", "magnitude"]


@functools.lru_cache(maxsize=None)
def _hann_np(win_len: int) -> np.ndarray:
    n = np.arange(win_len)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_len)).astype(np.float64)


def hann_window(win_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic (fftbins=True) Hann window, matching scipy/librosa default.

    Only the numpy array is cached — caching a jnp array would capture a
    tracer when first called inside jit and leak it into later traces.
    """
    return jnp.asarray(_hann_np(win_len), dtype=dtype)


def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, frame_length) via strided gather."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop_length
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    )  # static index matrix
    return x[..., idx]


def _pad_center(x: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    pad = n_fft // 2
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def stft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: tp.Optional[int] = None,
    window: tp.Optional[jnp.ndarray] = None,
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT of (..., T) -> (..., n_frames, n_fft//2 + 1)."""
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:  # center-pad window to n_fft, librosa-style
        lp = (n_fft - win_length) // 2
        window = jnp.pad(window, (lp, n_fft - win_length - lp))
    if center:
        x = _pad_center(x, n_fft)
    frames = frame_signal(x, n_fft, hop_length)
    frames = frames * window.astype(frames.dtype)
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def magnitude(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: tp.Optional[int] = None,
    center: bool = True,
) -> jnp.ndarray:
    """|STFT| as (..., n_frames, n_bins) — the reference's ``magnitude`` layout
    (frames-first, spectrogram_processors.py:204)."""
    return jnp.abs(stft(x, n_fft, hop_length, win_length, center=center))


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """(..., n_frames, F) -> (..., hop*(n_frames-1)+F) overlap-add.

    When hop divides the frame length (every STFT/MDCT config in this repo),
    OLA is R=F/hop shifted DENSE adds: split each frame into R hop-sized
    strips; the k-th strip plane, zero-padded k strips in front, sums
    elementwise with the others. Measured motivation: the previous
    scatter-add formulation ran at 0.41 TF/s / 45 GB/s on v5e (neither
    compute- nor bandwidth-bound — scatter serializes on the VPU) and made
    the ISTFT head cost 153 ms vs 47 ms for the whole ConvNeXt backbone at
    B32 T1024. Scatter-add remains as the generic fallback.
    """
    n_frames, f = frames.shape[-2], frames.shape[-1]
    out_len = f + hop_length * (n_frames - 1)
    if f % hop_length == 0:
        r = f // hop_length
        strips = frames.reshape(frames.shape[:-1] + (r, hop_length))
        acc = None
        for k in range(r):
            pad = [(0, 0)] * (frames.ndim - 2) + [(k, r - 1 - k), (0, 0)]
            part = jnp.pad(strips[..., k, :], pad)
            acc = part if acc is None else acc + part
        return acc.reshape(frames.shape[:-2] + (out_len,))

    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, f))
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(f)[None, :]
    idx = jnp.asarray(idx.reshape(-1))

    def ola(fr):
        return jnp.zeros((out_len,), fr.dtype).at[idx].add(fr.reshape(-1))

    return jax.vmap(ola)(flat).reshape(batch_shape + (out_len,))


def istft(
    spec: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: tp.Optional[int] = None,
    window: tp.Optional[jnp.ndarray] = None,
    length: tp.Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT with windowed overlap-add and squared-window normalization.

    spec: complex (..., n_frames, n_fft//2+1), centered analysis assumed.
    Used by the ISTFT vocoder head (reference: tts/vocoders/vocos/modules/heads/istft.py:19).
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        lp = (n_fft - win_length) // 2
        window = jnp.pad(window, (lp, n_fft - win_length - lp))

    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # (..., n_frames, n_fft)
    frames = frames * window

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    sig = overlap_add(frames, hop_length)
    wsq = window * window
    wsum = overlap_add(jnp.broadcast_to(wsq, (n_frames, n_fft)), hop_length)
    sig = sig / jnp.maximum(wsum, 1e-11)

    pad = n_fft // 2
    sig = sig[..., pad : out_len - pad]
    if length is not None:
        sig = sig[..., :length]
    return sig
