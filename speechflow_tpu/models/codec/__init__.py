from speechflow_tpu.models.codec.rvq import NeuralCodec, CodecParams, ResidualVQ

__all__ = ["NeuralCodec", "CodecParams", "ResidualVQ"]
