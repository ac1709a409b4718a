from speechflow_tpu.models.tts.model import ParallelTTSModel, ParallelTTSParams
from speechflow_tpu.models.tts.batch_processor import TTSBatchProcessor
from speechflow_tpu.models.tts.criterion import TTSCriterion
from speechflow_tpu.models.tts.xtts import (
    XTTSBatchProcessor,
    XTTSModel,
    XTTSParams,
    xtts_criterion,
)

__all__ = ["ParallelTTSModel", "ParallelTTSParams", "TTSBatchProcessor", "TTSCriterion",
           "XTTSModel", "XTTSParams", "XTTSBatchProcessor", "xtts_criterion"]
