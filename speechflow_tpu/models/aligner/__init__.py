from speechflow_tpu.models.aligner.model import GlowTTSAligner, GlowTTSParams
from speechflow_tpu.models.aligner.criterion import AlignerCriterion
from speechflow_tpu.models.aligner.batch_processor import AlignerBatchProcessor

__all__ = ["GlowTTSAligner", "GlowTTSParams", "AlignerCriterion", "AlignerBatchProcessor"]
