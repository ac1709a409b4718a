from speechflow_tpu.models.biometric.ecapa import ECAPAEmbedder, ECAPAParams

__all__ = ["ECAPAEmbedder", "ECAPAParams"]
