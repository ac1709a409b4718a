from speechflow_tpu.annotator.asr import ASRBase, FileASR, WhisperASR, run_audio_transcription
from speechflow_tpu.annotator.cloud_asr import (
    ASRException,
    ASRRequestLimitException,
    CloudASR,
    GoogleSTTService,
    YandexSTTService,
    run_cloud_transcription,
)
from speechflow_tpu.annotator.text_alignment import align_words, normalize_word
from speechflow_tpu.annotator.seg_generator import SegGenerator
from speechflow_tpu.annotator.align import Aligner, AlignStage

__all__ = ["ASRBase", "FileASR", "WhisperASR", "run_audio_transcription",
           "ASRException", "ASRRequestLimitException", "CloudASR",
           "GoogleSTTService", "YandexSTTService", "run_cloud_transcription",
           "align_words", "normalize_word", "SegGenerator", "Aligner", "AlignStage"]
