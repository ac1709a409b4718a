"""1D-signal contour handlers: enhancement, clipping, normalization,
per-utterance averages, pitch wavelets, time-dim resampling, field aliasing.

Capability parity with the reference's 1D-signal handler family
(speechflow/data_pipeline/datasample_processors/spectrogram_processors.py:1004-1339
signal_enhancement/clip/normalize/average_by_time/pitch_to_wavelet,
audio_processors.py:468 timedim_interpolation, auxiliary.py:19 store_field).
These run host-side in the feature workers; they operate on short per-frame
contours (pitch/energy/flatness), where numpy is the right tool — the device
ops in speechflow_tpu.ops stay reserved for the batched heavy DSP.

Divergences (documented, not accidental):
- ``signal_enhancement(interpolate_zeros=..., max_zero_interval=t)`` keeps
  zero runs of >= t frames at zero instead of the reference's anchor-deletion
  heuristic (same intent — don't hallucinate F0 across long pauses — with
  simpler, testable semantics).
- ``pitch_to_wavelet`` computes the ricker CWT directly (scipy removed
  ``signal.cwt`` in 1.15); numerics match the legacy scipy implementation.
"""

from __future__ import annotations

import typing as tp

import numpy as np
from scipy.signal import savgol_filter

from speechflow_tpu.data.core.datasample import SpectrogramDataSample
from speechflow_tpu.data.processors import handler
from speechflow_tpu.data.processors.text import BOS, EOS, SIL

__all__ = []

_CONTOURS = {"pitch", "energy", "spectral_flatness"}


def _as_list(attributes: tp.Union[str, tp.List[str]]) -> tp.List[str]:
    return [attributes] if isinstance(attributes, str) else list(attributes)


def _get_contour(ds, attr: str) -> tp.Optional[np.ndarray]:
    if hasattr(ds, attr):
        return getattr(ds, attr)
    if attr in ds.additional:
        return ds.additional[attr]
    raise KeyError(f"attribute '{attr}' not found on {type(ds).__name__}")


def _set_contour(ds, attr: str, values: np.ndarray) -> None:
    if hasattr(ds, attr):
        setattr(ds, attr, values)
    else:
        ds.additional[attr] = values


def _reject_outliers(x: np.ndarray, m: float = 2.0) -> np.ndarray:
    keep = np.abs(x - x.mean()) < m * x.std()
    return x[keep] if keep.any() else x


@handler(inputs=set(), outputs=set(), optional=_CONTOURS)
def signal_enhancement(
    ds: SpectrogramDataSample,
    attributes: tp.Union[str, tp.List[str]],
    smooth: bool = False,
    interpolate_zeros: bool = False,
    set_zero_in_pauses: bool = False,
    max_zero_interval: tp.Optional[int] = None,
    smooth_options: tp.Optional[dict] = None,
) -> SpectrogramDataSample:
    """Clean a 1D contour: linear interpolation over unvoiced/zero frames,
    Savitzky-Golay smoothing, and forced zeros inside annotated pauses
    (reference: spectrogram_processors.py:1017)."""
    for attr in _as_list(attributes):
        values = _get_contour(ds, attr)
        if values is None:
            continue
        values = np.asarray(values, dtype=np.float64).copy()
        assert values.ndim == 1, f"'{attr}' must be 1D"

        if interpolate_zeros:
            nz = np.flatnonzero(values != 0)
            if 0 < len(nz) < len(values):
                filled = np.interp(np.arange(len(values)), nz, values[nz])
                if max_zero_interval is not None:
                    t = max(int(max_zero_interval), 2)
                    # zero runs of >= t frames stay zero (long pauses)
                    gap_start = nz[:-1][(nz[1:] - nz[:-1]) > t]
                    for g0, g1 in zip(gap_start, nz[np.searchsorted(nz, gap_start) + 1]):
                        filled[g0 + 1:g1] = 0.0
                    # leading/trailing zero runs also respect the threshold
                    if nz[0] > t:
                        filled[:nz[0]] = 0.0
                    if len(values) - 1 - nz[-1] > t:
                        filled[nz[-1] + 1:] = 0.0
                values = filled

        if smooth:
            opts = dict(window_length=5, polyorder=1, mode="wrap")
            opts.update(smooth_options or {})
            if len(values) > opts["window_length"]:
                values = np.clip(savgol_filter(values, **opts), 0.0, None)

        if set_zero_in_pauses:
            ph_ts = getattr(ds, "phoneme_timestamps", None)
            phonemes = getattr(ds, "phonemes", None)
            hop = getattr(ds, "hop_len", None)
            sr = ds.sample_rate or (ds.audio_chunk.sr if ds.audio_chunk else None)
            if ph_ts is not None and phonemes is not None and hop and sr:
                for (t0, t1), ph in zip(np.asarray(ph_ts), phonemes):
                    if ph in (SIL, BOS, EOS, "", "_"):
                        a = int(t0 * sr / hop)
                        b = int(t1 * sr / hop)
                        values[a:b] = 0.0

        _set_contour(ds, attr, values.astype(np.float32))
    return ds


@handler(inputs=set(), outputs=set(), optional=_CONTOURS)
def clip(
    ds: SpectrogramDataSample,
    attributes: tp.Union[str, tp.List[str]],
    min_value: tp.Optional[float] = None,
    max_value: tp.Optional[float] = None,
) -> SpectrogramDataSample:
    """Clip contours; applied before normalization
    (reference: spectrogram_processors.py:1129)."""
    for attr in _as_list(attributes):
        values = _get_contour(ds, attr)
        if values is not None:
            _set_contour(ds, attr, np.clip(values, min_value, max_value))
    return ds


@handler(inputs=set(), outputs={"ranges"}, optional=_CONTOURS)
def normalize(
    ds: SpectrogramDataSample,
    attributes: tp.Union[str, tp.List[str]],
    normalize_by: str = "sample",           # sample | speaker | constant
    method: str = "minmax",                 # minmax | quantile | z-norm
    filter_outliers: bool = False,
    quantile: float = 0.98,
    min_value: tp.Optional[float] = None,
    max_value: tp.Optional[float] = None,
    ranges=None,                            # StatisticsRange (injected)
) -> SpectrogramDataSample:
    """Normalize 1D contours to [0, 1] (minmax/quantile) or zero-mean
    (z-norm), per sample / per speaker (via the fitted StatisticsRange
    singleton) / by constants. Records the applied (lo, hi, span) per
    attribute in ``ds.ranges`` so variance denormalization can invert it
    (reference: spectrogram_processors.py:1158)."""
    if ds.ranges is None:
        ds.ranges = {}
    for attr in _as_list(attributes):
        values = _get_contour(ds, attr)
        if values is None:
            continue
        values = np.asarray(values, dtype=np.float32).copy()
        if values.ndim != 1:
            continue

        if normalize_by == "constant":
            assert min_value is not None and max_value is not None
            a_min, a_max = float(min_value), float(max_value)
        elif normalize_by == "speaker":
            if ranges is None:
                raise ValueError(
                    "normalize(normalize_by='speaker') needs the StatisticsRange "
                    "singleton in singleton_handlers")
            lo, hi, mean, std = ranges.get(attr, getattr(ds, "speaker_name", None))
            if method == "z-norm":
                a_min, a_max = float(mean), float(mean + 4.0 * max(std, 1e-6))
            else:
                a_min, a_max = float(lo), float(hi)
        else:  # sample
            pool = values[values != 0] if "pitch" in attr else values
            if pool.size == 0:
                pool = values
            if filter_outliers:
                pool = _reject_outliers(pool)
            if method == "quantile":
                a_min = float(np.quantile(pool, 1 - quantile))
                a_max = float(np.quantile(pool, quantile))
            elif method == "z-norm":
                mean, std = float(pool.mean()), float(pool.std())
                a_min, a_max = mean, mean + 4.0 * max(std, 1e-6)
            else:
                a_min, a_max = float(pool.min()), float(pool.max())
            if min_value is not None:
                a_min = float(min_value)
            if max_value is not None:
                a_max = float(max_value)

        span = max(a_max - a_min, 1e-6)
        _set_contour(ds, attr, ((values - a_min) / span).astype(np.float32))
        ds.ranges[attr] = np.asarray([a_min, a_max, span], dtype=np.float32)
    return ds


@handler(inputs=set(), outputs={"averages"}, optional=_CONTOURS | {"durations"})
def average_by_time(
    ds: SpectrogramDataSample,
    attributes: tp.Union[str, tp.List[str]],
    use_quantile: bool = False,
    quantile: float = 0.95,
    min_value: tp.Optional[float] = None,
) -> SpectrogramDataSample:
    """Per-utterance scalar averages of contours (outlier-rejected or
    quantile-clipped), plus the special ``rate`` = tokens/second — the inputs
    to the model's average-embedding conditioning
    (reference: spectrogram_processors.py:1299)."""
    ds.averages = dict(ds.averages or {})
    for attr in _as_list(attributes):
        if attr == "rate":
            n_tok = getattr(ds, "n_tokens", 0)
            dur = ds.audio_chunk.duration if ds.audio_chunk is not None else 0.0
            ds.averages["rate"] = np.float32(n_tok / dur if dur else 0.0)
            continue
        values = _get_contour(ds, attr)
        if values is None:
            continue
        values = np.asarray(values, dtype=np.float32).ravel()
        if min_value is not None:
            values = values[values > min_value]
        if values.size == 0:
            ds.averages[attr] = np.float32(0.0)
            continue
        if use_quantile:
            lo = np.quantile(values, 1 - quantile)
            hi = np.quantile(values, quantile)
            values = np.clip(values, lo, hi)
        else:
            values = _reject_outliers(values)
        ds.averages[attr] = np.float32(values.mean())
    return ds


def _ricker(points: int, a: float) -> np.ndarray:
    """Ricker (mexican hat) wavelet, matching legacy scipy.signal.ricker."""
    A = 2.0 / (np.sqrt(3.0 * a) * np.pi ** 0.25)
    x = np.arange(points) - (points - 1.0) / 2.0
    xsq = (x / a) ** 2
    return A * (1.0 - xsq) * np.exp(-xsq / 2.0)


@handler(inputs={"pitch"}, outputs={"pitch"})
def pitch_to_wavelet(ds: SpectrogramDataSample, num_bands: int = 100) -> SpectrogramDataSample:
    """Continuous ricker-wavelet transform of the F0 contour: pitch becomes a
    (T, num_bands) multi-scale prosody representation
    (reference: spectrogram_processors.py:1005)."""
    x = np.asarray(ds.pitch, dtype=np.float64).ravel()
    out = np.empty((num_bands, len(x)), dtype=np.float64)
    for i, width in enumerate(range(1, num_bands + 1)):
        n = min(10 * width, len(x))
        out[i] = np.convolve(x, _ricker(n, width), mode="same")
    ds.pitch = out.T.astype(np.float32)
    return ds


@handler(inputs=set(), outputs=set(), optional=_CONTOURS | {"ssl_feat", "mel"})
def timedim_interpolation(
    ds: SpectrogramDataSample,
    features: tp.Union[str, tp.List[str]],
    shape_as: str = "mel",
    mode: str = "linear",
    ratio: float = 1.0,
) -> SpectrogramDataSample:
    """Resample features along time to ratio * len(shape_as): aligns pitch /
    energy / SSL frames with the mel frame grid when hop sizes differ
    (reference: audio_processors.py:468)."""
    target = getattr(ds, shape_as, None)
    if target is None:
        raise KeyError(f"shape_as '{shape_as}' not set on the sample")
    t_out = int(ratio * target.shape[0])
    for name in _as_list(features):
        feat = getattr(ds, name, None) if hasattr(ds, name) else ds.additional.get(name)
        if feat is None:
            continue
        t_in = feat.shape[0]
        if t_in == t_out:
            continue
        pos = np.linspace(0.0, t_in - 1.0, t_out)
        if mode == "nearest":
            res = feat[np.round(pos).astype(np.int64)]
        else:
            i0 = np.floor(pos).astype(np.int64)
            i1 = np.minimum(i0 + 1, t_in - 1)
            w = (pos - i0).astype(np.float32)
            if feat.ndim == 1:
                res = feat[i0] * (1 - w) + feat[i1] * w
            else:
                res = feat[i0] * (1 - w)[:, None] + feat[i1] * w[:, None]
        _set_contour(ds, name, res.astype(np.float32))
    return ds


@handler(inputs=set(), outputs=set())
def store_field(ds: SpectrogramDataSample, key: str, as_key: str) -> SpectrogramDataSample:
    """Copy a field into ``ds.additional[as_key]`` before a later handler
    overwrites it (reference: auxiliary.py:19 — e.g. keeping the speechbrain
    bio embedding when a second biometric pass replaces speaker_emb)."""
    attr = getattr(ds, key, None) if hasattr(ds, key) else ds.additional.get(key)
    if attr is not None:
        ds.additional[as_key] = np.copy(attr) if isinstance(attr, np.ndarray) else attr
    return ds
