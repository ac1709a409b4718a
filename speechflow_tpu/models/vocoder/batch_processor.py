"""Vocoder batch processor: collated batch -> (inputs, targets).

Capability parity with the reference VocoderBatchProcessor
(tts/vocoders/batch_processor.py:15 — a re-typed TTSBatchProcessor): the
vocoder and the acoustic model share one input schema (SURVEY §A.4), so this
maps the collated fields into plain dicts the generator/criterion consume.
"""

from __future__ import annotations

import typing as tp

import numpy as np

from speechflow_tpu.data.core.batch import Batch

__all__ = ["VocoderBatchProcessor"]


class VocoderBatchProcessor:
    def __init__(self, use_mel: bool = False):
        self.use_mel = use_mel

    def __call__(self, batch: tp.Union[Batch, dict]) -> tp.Tuple[dict, dict]:
        c = batch.collated_samples if isinstance(batch, Batch) else batch
        get = (lambda k: c.get(k)) if isinstance(c, dict) else (lambda k: getattr(c, k, None))
        wav = get("waveform")
        inputs: tp.Dict[str, np.ndarray] = {"waveform": wav}
        if self.use_mel and get("mel") is not None:
            inputs["mel"] = get("mel")
        if get("pitch") is not None:  # frame-level F0 for NSF heads
            inputs["pitch"] = get("pitch")
        if get("speaker_emb") is not None:
            inputs["speaker_emb"] = get("speaker_emb")
        targets = {"waveform": wav}
        return inputs, targets
