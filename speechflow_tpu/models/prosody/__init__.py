from speechflow_tpu.models.prosody.model import ProsodyModel, ProsodyParams
from speechflow_tpu.models.prosody.criterion import ProsodyCriterion
from speechflow_tpu.models.prosody.interface import ProsodyPredictionInterface

__all__ = ["ProsodyModel", "ProsodyParams", "ProsodyCriterion", "ProsodyPredictionInterface"]
