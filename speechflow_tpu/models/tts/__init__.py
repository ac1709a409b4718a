from speechflow_tpu.models.tts.model import ParallelTTSModel, ParallelTTSParams
from speechflow_tpu.models.tts.batch_processor import TTSBatchProcessor
from speechflow_tpu.models.tts.criterion import TTSCriterion

__all__ = ["ParallelTTSModel", "ParallelTTSParams", "TTSBatchProcessor", "TTSCriterion"]
