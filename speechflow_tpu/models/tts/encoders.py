"""Encoder zoo for the acoustic-model kit.

Capability parity with the reference encoders
(tts/acoustic_models/modules/components/encoders/): CNNEncoder, RNNEncoder
(bi-GRU), TransformerEncoder (FFT blocks), DiTEncoder (AdaNorm-conditioned
transformer), VarianceEncoder (encoder over content + variance embedding),
VQEncoder (VQ bottleneck ± adversarial classification), ContextEncoder
(parallel sub-encoders over content streams), DummyEncoder. Registered by
name in ``TTS_ENCODERS`` (ComponentCollection analogue,
speechflow/training/utils/collection.py:8).
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import nnx

from speechflow_tpu.models.tts.common import (
    ConvStack,
    DiTBlock,
    TransformerBlock,
    VectorQuantizer,
    grad_reverse,
)
from speechflow_tpu.utils.masks import apply_mask, sequence_mask

__all__ = ["TTS_ENCODERS", "CNNEncoder", "RNNEncoder", "TransformerEncoder",
           "DiTEncoder", "VQEncoder", "ContextEncoder", "DummyEncoder"]


class DummyEncoder(nnx.Module):
    def __init__(self, dim_in: int, dim_out: int, rngs: nnx.Rngs = None, **kw):
        self.proj = None
        if dim_in != dim_out:
            self.proj = nnx.Linear(dim_in, dim_out, rngs=rngs or nnx.Rngs(0))
        self.dim_out = dim_out

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        return self.proj(x) if self.proj is not None else x


class CNNEncoder(nnx.Module):
    def __init__(self, dim_in: int, dim_out: int, dim: int = 256, n_layers: int = 3,
                 kernel_size: int = 5, dropout: float = 0.1, rngs: nnx.Rngs = None, **kw):
        self.stack = ConvStack(dim_in, dim, dim_out, n_layers, kernel_size, dropout,
                               rngs=rngs or nnx.Rngs(0))
        self.dim_out = dim_out

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        if lengths is not None:
            x = apply_mask(x, sequence_mask(lengths, x.shape[1]))
        return self.stack(x, deterministic=deterministic)


class RNNEncoder(nnx.Module):
    """Bidirectional GRU encoder (reference RNNEncoder)."""

    def __init__(self, dim_in: int, dim_out: int, dim: int = 256,
                 rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        half = dim_out // 2
        self.fwd = nnx.RNN(nnx.GRUCell(dim_in, half, rngs=rngs))
        self.bwd = nnx.RNN(nnx.GRUCell(dim_in, dim_out - half, rngs=rngs), reverse=True,
                           keep_order=True)
        self.dim_out = dim_out

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        f = self.fwd(x)
        b = self.bwd(x)
        out = jnp.concatenate([f, b], axis=-1)
        if lengths is not None:
            out = apply_mask(out, sequence_mask(lengths, x.shape[1]))
        return out


class TransformerEncoder(nnx.Module):
    """FFT-block encoder (FastSpeech-style)."""

    def __init__(self, dim_in: int, dim_out: int, dim: int = 256, n_layers: int = 4,
                 n_heads: int = 4, dropout: float = 0.1, rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.pre = nnx.Linear(dim_in, dim, rngs=rngs) if dim_in != dim else None
        self.blocks = nnx.List([
            TransformerBlock(dim, n_heads, dropout=dropout, rngs=rngs)
            for _ in range(n_layers)
        ])
        self.post = nnx.Linear(dim, dim_out, rngs=rngs) if dim != dim_out else None
        self.dim_out = dim_out

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        if self.pre is not None:
            x = self.pre(x)
        mask = sequence_mask(lengths, x.shape[1]) if lengths is not None else None
        for blk in self.blocks:
            x = blk(x, mask, deterministic=deterministic)
        if self.post is not None:
            x = self.post(x)
        if mask is not None:
            x = apply_mask(x, mask)
        return x


class DiTEncoder(nnx.Module):
    """AdaNorm-conditioned transformer (reference DiTEncoder; also the CFM
    estimator backbone)."""

    def __init__(self, dim_in: int, dim_out: int, dim: int = 256, n_layers: int = 4,
                 n_heads: int = 4, cond_dim: int = 256, dropout: float = 0.0,
                 rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.pre = nnx.Linear(dim_in, dim, rngs=rngs) if dim_in != dim else None
        self.blocks = nnx.List([
            DiTBlock(dim, cond_dim, n_heads, dropout=dropout, rngs=rngs)
            for _ in range(n_layers)
        ])
        self.post = nnx.Linear(dim, dim_out, rngs=rngs) if dim != dim_out else None
        self.dim_out = dim_out
        self.cond_dim = cond_dim

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        if self.pre is not None:
            x = self.pre(x)
        if cond is None:
            cond = jnp.zeros((x.shape[0], self.cond_dim), x.dtype)
        mask = sequence_mask(lengths, x.shape[1]) if lengths is not None else None
        for blk in self.blocks:
            x = blk(x, cond, mask, deterministic=deterministic)
        if self.post is not None:
            x = self.post(x)
        if mask is not None:
            x = apply_mask(x, mask)
        return x


class VQEncoder(nnx.Module):
    """Encoder + VQ bottleneck ± adversarial speaker classifier
    (reference VQEncoder / SFEncoder classification adaptor)."""

    def __init__(self, dim_in: int, dim_out: int, dim: int = 256, n_layers: int = 3,
                 codebook_size: int = 256, n_speakers: tp.Optional[int] = None,
                 rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.enc = CNNEncoder(dim_in, dim_out, dim, n_layers, rngs=rngs)
        self.vq = VectorQuantizer(codebook_size, dim_out, rngs=rngs)
        self.clf = None
        if n_speakers:
            self.clf = nnx.Linear(dim_out, n_speakers, rngs=rngs)
        self.dim_out = dim_out
        self._aux: tp.Dict[str, jnp.ndarray] = {}

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        h = self.enc(x, lengths, deterministic=deterministic)
        q, idx, vq_loss = self.vq(h)
        self._aux = {"vq_loss": vq_loss, "vq_codes": idx}
        if self.clf is not None:
            pooled = jnp.mean(grad_reverse(q), axis=1)
            self._aux["inverse_speaker_logits"] = self.clf(pooled)
        return q

    def pop_aux(self) -> tp.Dict[str, jnp.ndarray]:
        aux, self._aux = self._aux, {}
        return aux


class ContextEncoder(nnx.Module):
    """Parallel sub-encoders whose outputs are concatenated
    (reference ContextEncoder, encoders/context_encoder.py:26)."""

    def __init__(self, dim_in: int, dim_out: int, sub_types: tp.Sequence[str] = ("cnn", "transformer"),
                 dim: int = 256, rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        per = dim_out // len(sub_types)
        dims = [per] * (len(sub_types) - 1) + [dim_out - per * (len(sub_types) - 1)]
        self.subs = nnx.List([
            TTS_ENCODERS[t](dim_in=dim_in, dim_out=d, dim=dim, rngs=rngs)
            for t, d in zip(sub_types, dims)
        ])
        self.dim_out = dim_out

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        outs = [s(x, lengths, cond, deterministic=deterministic) for s in self.subs]
        return jnp.concatenate(outs, axis=-1)


TTS_ENCODERS: tp.Dict[str, type] = {
    "dummy": DummyEncoder,
    "cnn": CNNEncoder,
    "rnn": RNNEncoder,
    "transformer": TransformerEncoder,
    "dit": DiTEncoder,
    "vq": VQEncoder,
    "context": ContextEncoder,
}
