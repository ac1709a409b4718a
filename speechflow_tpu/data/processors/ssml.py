"""SSML prosody modifiers (reference: datasample_processors/ssml_processors.py):
parse <prosody pitch/rate/volume> spans in the input text into per-token
modifier sequences that the variance adaptor multiplies onto its predictions
(pitch_modifier -> aggregate_pitch, volume_modifier -> energy, rate_modifier
-> durations; SURVEY §A.1 step 3).
"""

from __future__ import annotations

import re
import typing as tp

import numpy as np

from speechflow_tpu.data.core.datasample import TTSDataSample
from speechflow_tpu.data.processors import handler

__all__ = ["parse_ssml", "apply_ssml_modifiers"]

_TAG = re.compile(r"<prosody([^>]*)>(.*?)</prosody>", re.DOTALL)
_ATTR = re.compile(r"(pitch|rate|volume)\s*=\s*\"([^\"]+)\"")


def _to_factor(value: str) -> float:
    value = value.strip()
    if value.endswith("%"):
        return 1.0 + float(value[:-1]) / 100.0
    named = {"x-low": 0.7, "low": 0.85, "medium": 1.0, "default": 1.0,
             "high": 1.15, "x-high": 1.3, "x-slow": 0.6, "slow": 0.8,
             "fast": 1.25, "x-fast": 1.5, "x-soft": 0.5, "soft": 0.75,
             "loud": 1.35, "x-loud": 1.7}
    if value in named:
        return named[value]
    try:
        return float(value)
    except ValueError:
        return 1.0


def parse_ssml(text: str) -> tp.Tuple[str, tp.List[tp.Tuple[str, dict]]]:
    """SSML-ish text -> (plain words joined, [(word, modifiers), ...])."""
    out: tp.List[tp.Tuple[str, dict]] = []
    pos = 0
    for m in _TAG.finditer(text):
        for w in text[pos:m.start()].split():
            out.append((w, {}))
        mods = {k: _to_factor(v) for k, v in _ATTR.findall(m.group(1))}
        for w in m.group(2).split():
            out.append((w, dict(mods)))
        pos = m.end()
    for w in text[pos:].split():
        out.append((w, {}))
    plain = " ".join(w for w, _ in out)
    return plain, out


@handler(inputs={"transcription"}, outputs={"pitch_modifier", "volume_modifier", "rate_modifier"})
def apply_ssml_modifiers(ds: TTSDataSample) -> TTSDataSample:
    """Expand word-level SSML modifiers to token level (uniform within word;
    tokens outside any span get factor 1.0). Requires ``ds.additional['ssml']``
    = the parse_ssml word list and word_lengths (tokens per word)."""
    n = ds.n_tokens
    mods = {k: np.ones(n, np.float32) for k in ("pitch_modifier", "volume_modifier", "rate_modifier")}
    ssml = ds.additional.get("ssml")
    wl = ds.word_lengths
    if ssml is not None and wl is not None and len(ssml) == len(wl):
        pos = 0
        for (word, factors), count in zip(ssml, wl):
            for key, mkey in (("pitch", "pitch_modifier"), ("volume", "volume_modifier"),
                              ("rate", "rate_modifier")):
                if key in factors:
                    mods[mkey][pos:pos + count] = factors[key]
            pos += count
    for k, v in mods.items():
        ds.additional[k] = v
    return ds
