"""Aligner batch processor: reuses the shared TTS input schema
(reference: forced_alignment batch processor mirrors the TTS one)."""

from __future__ import annotations

from speechflow_tpu.models.tts.batch_processor import TTSBatchProcessor

__all__ = ["AlignerBatchProcessor"]


class AlignerBatchProcessor(TTSBatchProcessor):
    pass
