from speechflow_tpu.interface.tts_interface import (
    ProsodyReference,
    TTSContext,
    TTSEvaluationInterface,
    TTSOptions,
)
from speechflow_tpu.interface.vocoder_interface import VocoderEvaluationInterface
from speechflow_tpu.interface.xtts_interface import XTTSEvaluationInterface

__all__ = [
    "TTSEvaluationInterface", "TTSContext", "TTSOptions", "ProsodyReference",
    "VocoderEvaluationInterface", "XTTSEvaluationInterface",
]
