"""TTS batch processor: collated batch -> (TTSForwardInput, TTSTarget).

Capability parity with the reference TTSBatchProcessor
(tts/acoustic_models/batch_processor.py:28): maps the collated fields into the
shared input schema consumed by both the acoustic model and the vocoder
(SURVEY §A.4). Speaker stat ranges (StatisticsRange) are embedded as a
(n_speakers, 4) table gathered by speaker_id on device.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import numpy as np

from speechflow_tpu.data.core.batch import Batch
from speechflow_tpu.models.tts.data_types import TTSForwardInput, TTSTarget

__all__ = ["TTSBatchProcessor"]


class TTSBatchProcessor:
    def __init__(self, ranges_table: tp.Optional[np.ndarray] = None):
        self.ranges_table = ranges_table  # (n_speakers, n_feat, 4)

    def __call__(self, batch: tp.Union[Batch, tp.Any]) -> tp.Tuple[TTSForwardInput, TTSTarget]:
        c = batch.collated_samples if isinstance(batch, Batch) else batch
        get = (lambda k: c.get(k)) if isinstance(c, dict) else (lambda k: getattr(c, k, None))

        ranges = None
        sid = get("speaker_id")
        if self.ranges_table is not None and sid is not None:
            ranges = self.ranges_table[np.maximum(sid, 0)]

        inputs = TTSForwardInput(
            transcription=get("transcription"),
            transcription_lengths=get("transcription_lengths"),
            speaker_id=sid,
            lang_id=get("lang_id"),
            speaker_emb=get("speaker_emb"),
            durations=get("durations"),
            aggregate_pitch=get("aggregate_pitch"),
            aggregate_energy=get("aggregate_energy"),
            ling_feat=get("ling_feat"),
            lm_feat=get("lm_feat"),
            xpbert_feat=get("xpbert_feat"),
            prosody=get("prosody"),
            mel=get("mel"),
            mel_lengths=get("mel_lengths"),
            pitch=get("pitch"),
            energy=get("energy"),
            ranges=ranges,
            speech_quality_emb=get("speech_quality_emb"),
            ssl_feat=get("ssl_feat"),
            averages=get("averages"),
        )
        extra = get("additional") or {}
        inputs = dataclasses.replace(
            inputs,
            pitch_modifier=extra.get("pitch_modifier"),
            volume_modifier=extra.get("volume_modifier"),
            rate_modifier=extra.get("rate_modifier"),
        )
        targets = TTSTarget(
            mel=get("mel"),
            mel_lengths=get("mel_lengths"),
            gate=get("gate"),
            durations=get("durations"),
            aggregate_pitch=get("aggregate_pitch"),
            aggregate_energy=get("aggregate_energy"),
            transcription_lengths=get("transcription_lengths"),
            speaker_id=sid,
        )
        return inputs, targets
