from speechflow_tpu.models.codec.rvq import NeuralCodec, CodecDecoder, CodecParams, ResidualVQ

__all__ = ["NeuralCodec", "CodecDecoder", "CodecParams", "ResidualVQ"]
