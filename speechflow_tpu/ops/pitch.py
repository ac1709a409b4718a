"""Batched F0 estimation on device (YIN with CMNDF + parabolic interpolation).

Replaces the reference PitchProcessor's CPU pyworld-dio / torchcrepe hot loop
(speechflow/data_pipeline/datasample_processors/spectrogram_processors.py:690-846)
with a fully batched, jit-compiled YIN: the difference function is computed via
FFT autocorrelation (O(W log W) per frame, one fused device call per batch),
frames are centered to line up 1:1 with mel frames (center=True STFT), and
unvoiced frames are zeroed exactly like the reference contract (f0 == 0 where
unvoiced). Exact pyworld-dio bit parity is out of scope (different algorithm);
accuracy is validated on synthetic tones/sweeps in tests (<1% relative error).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from speechflow_tpu.ops.stft import frame_signal

__all__ = ["yin_f0", "yingram", "yingram_midi_range", "midi_to_lag", "lag_to_midi"]


def midi_to_lag(sr: float, midi) -> np.ndarray:
    """Midi note -> time lag in samples (A4=69 at 440 Hz)."""
    return sr / (440.0 * 2.0 ** ((np.asarray(midi, np.float64) - 69.0) / 12.0))


def lag_to_midi(sr: float, lag) -> np.ndarray:
    """Time lag in samples -> midi note."""
    return 12.0 * np.log2(sr / (440.0 * np.asarray(lag, np.float64))) + 69.0


def yingram_midi_range(sr: int, lag_min: int, lag_max: int) -> tp.Tuple[int, int]:
    """Closed midi interval covered by the lag search range."""
    return int(np.ceil(lag_to_midi(sr, lag_max))), int(lag_to_midi(sr, lag_min))


def yingram(
    x: jnp.ndarray,
    sr: int,
    hop_length: int = 256,
    frame_length: int = 2048,
    lag_min: int = 22,
    lag_max: int = 2047,
    bins_per_semitone: int = 20,
) -> jnp.ndarray:
    """(B, T) waveform -> (B, n_frames, n_bins) midi-scale CMNDF image.

    The NANSY-style "yingram" pitch representation the reference exposes as
    PitchProcessor ``method="yingram"`` (spectrogram_processors.py:793-813,
    algorithms/audio_processing/yin_image.py): the YIN cumulative
    mean-normalized difference function, lag-normalized, sampled by linear
    interpolation on a fractional-lag grid of ``bins_per_semitone`` bins per
    midi semitone over the [lag_min, lag_max] search range.  Low values mark
    periodicity at that bin's pitch; downstream models consume the image
    directly (no hard f0 decision, so no voicing errors propagate).

    Differences from the reference (intentional): the autocorrelation term is
    computed with zero-padded (linear) FFT correlation — the reference's
    unpadded rfft wraps circularly, folding acf(W-tau) into acf(tau) — and
    frames are centered like yin_f0/STFT so the image lines up 1:1 with mel
    frames (the reference right-pads and then appends a zero column).
    n_frames == 1 + T // hop_length.  Static shapes; one fused device call.
    """
    if x.ndim == 1:
        x = x[None]
        squeeze = True
    else:
        squeeze = False
    w = frame_length
    assert lag_max < w, "frame_length must exceed lag_max"

    pad = w // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(xp, w, hop_length)  # (B, F, W)

    # linear acf at lags 0..lag_max via zero-padded FFT
    nfft = int(2 ** np.ceil(np.log2(w + lag_max)))
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    acf = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)[..., : lag_max]

    # d(tau) = c[W-tau] - 2 acf(tau) + c[W] - c[tau], c = cumsum(x^2)
    sq = frames * frames
    csum = jnp.concatenate(
        [jnp.zeros_like(sq[..., :1]), jnp.cumsum(sq, axis=-1)], axis=-1)
    taus = jnp.arange(lag_max)
    d = (csum[..., w - lag_max + 1: w + 1][..., ::-1]
         - 2.0 * acf
         + csum[..., w:] - csum[..., :lag_max])
    d = jnp.maximum(d, 0.0)

    # lag-normalized CMNDF (YIN Eq. 8), d'(0) = 1
    cum = jnp.cumsum(d[..., 1:], axis=-1)
    dprime = d[..., 1:] * taus[1:] / jnp.maximum(cum, 1e-7)
    dprime = jnp.concatenate([jnp.ones_like(d[..., :1]), dprime], axis=-1)

    # static fractional-lag grid: bins_per_semitone bins per midi semitone
    mmin, mmax = yingram_midi_range(sr, lag_min, lag_max)
    midis = np.arange(mmin, mmax + 1, 1.0 / bins_per_semitone)
    lags = midi_to_lag(sr, midis)  # descending in midi -> ascending? (static)
    lo = np.clip(np.floor(lags).astype(np.int64), 0, lag_max - 1)
    hi = np.clip(lo + 1, 0, lag_max - 1)
    frac = jnp.asarray((lags - lo) / np.maximum(hi - lo, 1), jnp.float32)
    img = (dprime[..., hi] - dprime[..., lo]) * frac + dprime[..., lo]
    return img[0] if squeeze else img


def yin_f0(
    x: jnp.ndarray,
    sr: int,
    hop_length: int = 256,
    frame_length: int = 2048,
    f0_min: float = 80.0,
    f0_max: float = 880.0,
    threshold: float = 0.2,
) -> jnp.ndarray:
    """(B, T) waveform -> (B, n_frames) f0 in Hz (0 where unvoiced).

    n_frames == 1 + T // hop_length (centered frames, matching center=True STFT).
    """
    if x.ndim == 1:
        x = x[None]
        squeeze = True
    else:
        squeeze = False

    tau_min = max(2, int(np.floor(sr / f0_max)))
    tau_max = int(np.ceil(sr / f0_min))
    w = frame_length
    assert tau_max < w, "frame_length must exceed sr/f0_min"

    pad = w // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(xp, w, hop_length)  # (B, F, W)
    b, f, _ = frames.shape

    half = w // 2  # difference-function support
    # d(tau) = r0(0) + r_tau(0) - 2*acf(tau), tau in [0, tau_max]
    # acf via FFT (zero-padded to w + tau_max for linear correlation)
    nfft = int(2 ** np.ceil(np.log2(w + tau_max)))
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    acf_full = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)
    acf = acf_full[..., : tau_max + 1]  # (B, F, tau_max+1) biased acf at lags 0..tau_max

    # windowed energies: e(tau) = sum_{j=tau}^{tau+half} x_j^2
    sq = frames * frames
    csum = jnp.cumsum(sq, axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    taus = jnp.arange(tau_max + 1)
    e_tau = csum[..., taus + half] - csum[..., taus]  # (B, F, tau_max+1)
    e0 = e_tau[..., :1]

    # acf over the half-window support: recompute linear acf restricted to half
    spec_h = jnp.fft.rfft(frames[..., :half], n=nfft, axis=-1)
    cross = jnp.fft.irfft(jnp.conj(spec_h) * jnp.fft.rfft(frames, n=nfft, axis=-1), n=nfft, axis=-1)
    acf_h = cross[..., : tau_max + 1]

    d = e0 + e_tau - 2.0 * acf_h  # difference function, d(0) ~ 0
    d = jnp.maximum(d, 0.0)

    # CMNDF: d'(tau) = d(tau)*tau / cumsum_{1..tau} d
    cum = jnp.cumsum(d[..., 1:], axis=-1)
    dprime = d[..., 1:] * taus[1:] / jnp.maximum(cum, 1e-12)
    dprime = jnp.concatenate([jnp.ones_like(d[..., :1]), dprime], axis=-1)

    # restrict search to [tau_min, tau_max]
    lag_mask = (taus >= tau_min) & (taus <= tau_max)
    dp_masked = jnp.where(lag_mask, dprime, jnp.inf)

    # first *local minimum* below threshold (librosa.yin-style trough picking);
    # fall back to the global minimum when nothing dips under the threshold
    left = jnp.concatenate([jnp.full_like(dp_masked[..., :1], jnp.inf), dp_masked[..., :-1]], axis=-1)
    right = jnp.concatenate([dp_masked[..., 1:], jnp.full_like(dp_masked[..., :1], jnp.inf)], axis=-1)
    is_trough = (dp_masked <= left) & (dp_masked <= right)
    cand = is_trough & (dp_masked < threshold)
    first_cand = jnp.argmax(cand, axis=-1)
    any_cand = jnp.any(cand, axis=-1)
    global_min = jnp.argmin(dp_masked, axis=-1)
    tau_star = jnp.where(any_cand, first_cand, global_min)

    # parabolic interpolation around tau_star
    tm1 = jnp.clip(tau_star - 1, 0, tau_max)
    tp1 = jnp.clip(tau_star + 1, 0, tau_max)
    idx = jnp.stack([tm1, tau_star, tp1], axis=-1)
    y = jnp.take_along_axis(dprime, idx, axis=-1)
    denom = y[..., 0] - 2.0 * y[..., 1] + y[..., 2]
    delta = jnp.where(
        jnp.abs(denom) > 1e-12,
        0.5 * (y[..., 0] - y[..., 2]) / denom,
        0.0,
    )
    delta = jnp.clip(delta, -0.5, 0.5)
    tau_refined = tau_star.astype(jnp.float32) + delta

    f0 = sr / jnp.maximum(tau_refined, 1.0)

    # voicing: CMNDF depth + frame energy gate
    dp_min = jnp.take_along_axis(dp_masked, tau_star[..., None], axis=-1)[..., 0]
    frame_rms = jnp.sqrt(jnp.mean(frames * frames, axis=-1))
    voiced = (dp_min < jnp.maximum(threshold, 0.35)) & (frame_rms > 1e-4)
    f0 = jnp.where(voiced, f0, 0.0)
    f0 = jnp.where((f0 >= f0_min) & (f0 <= f0_max), f0, 0.0)

    return f0[0] if squeeze else f0
