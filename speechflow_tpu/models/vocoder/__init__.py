from speechflow_tpu.models.vocoder.model import Vocos, VocosParams
from speechflow_tpu.models.vocoder.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    VocoderDiscriminator,
)
from speechflow_tpu.models.vocoder.criterion import vocoder_gen_criterion, vocoder_disc_criterion
from speechflow_tpu.models.vocoder.batch_processor import VocoderBatchProcessor

__all__ = [
    "Vocos", "VocosParams",
    "MultiPeriodDiscriminator", "MultiResolutionDiscriminator", "VocoderDiscriminator",
    "vocoder_gen_criterion", "vocoder_disc_criterion", "VocoderBatchProcessor",
]
