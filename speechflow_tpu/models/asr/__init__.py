from speechflow_tpu.models.asr.ctc_model import (
    CTCRecognizer,
    CTCRecognizerParams,
    greedy_ctc_decode,
)

__all__ = ["CTCRecognizer", "CTCRecognizerParams", "greedy_ctc_decode"]
