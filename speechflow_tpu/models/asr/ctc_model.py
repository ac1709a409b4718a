"""Trainable CTC phoneme recognizer.

The reference's transcription step calls external ASR services (Whisper /
cloud, annotator/audio_transcription.py:67) and trains frame-level
transcription heads against CTC (speechflow/training/losses/ctc.py). Offline
the framework provides the recognizer itself: a strided-conv + bi-GRU encoder
over log-mel emitting per-frame phoneme logits, trained with the loss zoo's
CTCLoss on the aligned mini corpus. Greedy collapse decoding yields phoneme
sequences plus frame-level timestamps for the annotation pipeline; the TTS
alphabet is the label space, so the aligner and recognizer share a vocab.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.training.base_model import BaseModelParams

__all__ = ["CTCRecognizerParams", "CTCRecognizer", "greedy_ctc_decode"]


class CTCRecognizerParams(BaseModelParams):
    n_symbols: int = 100                 # label space incl. blank at index 0
    sample_rate: int = 24000
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 80
    dim: int = 192
    n_conv: int = 2
    time_stride: int = 2                 # conv downsampling of the frame rate


class CTCRecognizer(nnx.Module):
    def __init__(self, params: CTCRecognizerParams,
                 rngs: tp.Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        p = params
        self.p = p
        dims = [p.n_mels] + [p.dim] * p.n_conv
        self.convs = nnx.List([
            nnx.Conv(dims[i], dims[i + 1], (5,),
                     strides=(p.time_stride if i == 0 else 1,),
                     padding="SAME", rngs=rngs)
            for i in range(p.n_conv)
        ])
        self.norms = nnx.List([nnx.LayerNorm(p.dim, rngs=rngs)
                               for _ in range(p.n_conv)])
        half = p.dim // 2
        self.fwd = nnx.RNN(nnx.GRUCell(p.dim, half, rngs=rngs))
        self.bwd = nnx.RNN(nnx.GRUCell(p.dim, p.dim - half, rngs=rngs),
                           reverse=True, keep_order=True)
        self.head = nnx.Linear(p.dim, p.n_symbols, rngs=rngs)

    def __call__(self, mel: jnp.ndarray,
                 lengths: tp.Optional[jnp.ndarray] = None):
        """(B, T, n_mels) log-mel -> ((B, T', V) logits, (B,) out lengths)."""
        x = mel
        for conv, norm in zip(self.convs, self.norms):
            x = norm(nnx.gelu(conv(x)))
        x = jnp.concatenate([self.fwd(x), self.bwd(x)], axis=-1)
        logits = self.head(x)
        if lengths is None:
            out_lens = jnp.full((mel.shape[0],), logits.shape[1], jnp.int32)
        else:
            out_lens = jnp.maximum(
                (lengths + self.p.time_stride - 1) // self.p.time_stride, 1)
        return logits, out_lens

    def recognize(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, T) waveform -> (B, T', V) logits (on-device mel front-end)."""
        from speechflow_tpu import ops

        mag = ops.magnitude(wav, self.p.n_fft, self.p.hop_length)
        mel = ops.amp_to_db(ops.linear_to_mel(mag, self.p.sample_rate,
                                              self.p.n_mels))
        return self(mel)[0]


def greedy_ctc_decode(logits: np.ndarray, blank_id: int = 0,
                      hop_s: tp.Optional[float] = None):
    """Collapse repeats, drop blanks. (T, V) -> (ids, [(begin_s, end_s)])."""
    ids = np.argmax(np.asarray(logits), axis=-1)
    out, spans = [], []
    prev = blank_id
    start = 0
    for t, i in enumerate(ids):
        if i != prev and prev != blank_id:
            out.append(int(prev))
            spans.append((start, t))
        if i != prev:
            start = t
        prev = i
    if prev != blank_id:
        out.append(int(prev))
        spans.append((start, len(ids)))
    if hop_s is not None:
        spans = [(b * hop_s, e * hop_s) for b, e in spans]
    return np.asarray(out, np.int32), spans
