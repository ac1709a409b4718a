"""Encoder zoo for the acoustic-model kit.

Capability parity with the reference encoders
(tts/acoustic_models/modules/components/encoders/): CNNEncoder, RNNEncoder
(bi-GRU), TransformerEncoder (FFT blocks, optional per-block remat),
DiTEncoder (AdaNorm-conditioned transformer), CBHGEncoder (conv bank +
highways), ConformerEncoder (macaron blocks + depthwise conv),
VarianceEncoder (multi-kernel convs + bi-LSTM), SFEncoder (source-filter
streams over pitch/energy embeddings), LinguisticConditionEncoder
(ling/LM-feature ConditionalLayers before a base encoder), VQEncoder (VQ
bottleneck ± adversarial classification), ContextEncoder (parallel
sub-encoders; concat or multi-stream output), DummyEncoder. Registered by
name in ``TTS_ENCODERS`` (ComponentCollection analogue,
speechflow/training/utils/collection.py:8).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from speechflow_tpu.models.tts.common import (
    ConvStack,
    DiTBlock,
    TransformerBlock,
    VectorQuantizer,
    grad_reverse,
)
from speechflow_tpu.ops.signal import depthwise_conv1d
from speechflow_tpu.utils.masks import apply_mask, sequence_mask

__all__ = ["TTS_ENCODERS", "CNNEncoder", "RNNEncoder", "TransformerEncoder",
           "DiTEncoder", "VQEncoder", "ContextEncoder", "DummyEncoder",
           "CBHGEncoder", "ConformerEncoder", "VarianceEncoder", "SFEncoder",
           "LinguisticConditionEncoder"]


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
    """FFT-block encoder (FastSpeech-style). ``use_remat`` rematerializes each
    block under autodiff (jax.checkpoint) — the TPU-first replacement for the
    reference Component base's sequence-chunking helpers: activation memory
    for long utterances is traded for recompute FLOPs without touching the
    static-shape program."""

    def __init__(self, dim_in: int, dim_out: int, dim: int = 256, n_layers: int = 4,
                 n_heads: int = 4, dropout: float = 0.1, use_remat: bool = False,
                 rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.pre = nnx.Linear(dim_in, dim, rngs=rngs) if dim_in != dim else None
        self.blocks = nnx.List([
            TransformerBlock(dim, n_heads, dropout=dropout, rngs=rngs)
            for _ in range(n_layers)
        ])
        self.post = nnx.Linear(dim, dim_out, rngs=rngs) if dim != dim_out else None
        self.dim_out = dim_out
        self.use_remat = use_remat

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        if self.pre is not None:
            x = self.pre(x)
        mask = sequence_mask(lengths, x.shape[1]) if lengths is not None else None
        for blk in self.blocks:
            if self.use_remat:
                x = nnx.remat(
                    lambda b, h: b(h, mask, deterministic=deterministic))(blk, x)
            else:
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
        # nnx.data: the dict carries traced arrays between __call__ and
        # pop_aux within one step; a plain attribute would be static
        self._aux: tp.Dict[str, jnp.ndarray] = nnx.data({})

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        h = self.enc(x, lengths, deterministic=deterministic)
        q, idx, vq_loss = self.vq(h)
        aux = {"vq_loss": vq_loss, "vq_codes": idx}
        if self.clf is not None:
            pooled = jnp.mean(grad_reverse(q), axis=1)
            aux["inverse_speaker_logits"] = self.clf(pooled)
        self._aux = nnx.data(aux)
        return q

    def pop_aux(self) -> tp.Dict[str, jnp.ndarray]:
        aux, self._aux = dict(self._aux), nnx.data({})
        return aux


class ContextEncoder(nnx.Module):
    """Parallel sub-encoders over the same content
    (reference ContextEncoder, encoders/context_encoder.py:26).
    ``concat=True`` (default) concatenates the sub-encoder outputs into one
    stream; ``concat=False`` returns them as a LIST of content streams — the
    reference's multi-stream content-list contract, consumed by the variance
    adaptor's per-stream routing (VarianceConfig.input_stream /
    cat_to_streams)."""

    def __init__(self, dim_in: int, dim_out: int, sub_types: tp.Sequence[str] = ("cnn", "transformer"),
                 dim: int = 256, concat: bool = True, rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        per = dim_out // len(sub_types)
        dims = [per] * (len(sub_types) - 1) + [dim_out - per * (len(sub_types) - 1)]
        self.subs = nnx.List([
            TTS_ENCODERS[t](dim_in=dim_in, dim_out=d, dim=dim, rngs=rngs)
            for t, d in zip(sub_types, dims)
        ])
        self.concat = concat
        self.stream_dims = dims
        self.dim_out = dim_out if concat else dims

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        outs = [s(x, lengths, cond, deterministic=deterministic) for s in self.subs]
        if self.concat:
            return jnp.concatenate(outs, axis=-1)
        return outs


class _Highway(nnx.Module):
    def __init__(self, dim: int, rngs: nnx.Rngs):
        self.h = nnx.Linear(dim, dim, rngs=rngs)
        self.t = nnx.Linear(dim, dim, rngs=rngs)

    def __call__(self, x):
        gate = jax.nn.sigmoid(self.t(x))
        return gate * nnx.relu(self.h(x)) + (1.0 - gate) * x


class CBHGEncoder(nnx.Module):
    """CBHG (conv bank + highway) encoder, the legacy ForwardTacotron text
    encoder (reference: encoders/cbhg_encoder.py:41): a bank of K convs with
    kernels 1..K over a prenet projection, stride-1 max pooling, two conv
    projections with a residual, then highway layers. LayerNorm replaces the
    reference's BatchNorm (batch-stat-free -> identical train/infer programs
    under jit)."""

    def __init__(self, dim_in: int, dim_out: int, dim: int = 256,
                 n_banks: int = 8, n_highways: int = 4, kernel_size: int = 3,
                 dropout: float = 0.1, rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.pre = nnx.Linear(dim_in, dim, rngs=rngs)
        self.bank = nnx.List([
            nnx.Conv(dim, dim, (k,), padding="SAME", use_bias=False, rngs=rngs)
            for k in range(1, n_banks + 1)
        ])
        self.bank_norm = nnx.LayerNorm(n_banks * dim, rngs=rngs)
        self.proj1 = nnx.Conv(n_banks * dim, dim, (kernel_size,), padding="SAME",
                              use_bias=False, rngs=rngs)
        self.norm1 = nnx.LayerNorm(dim, rngs=rngs)
        self.proj2 = nnx.Conv(dim, dim, (kernel_size,), padding="SAME",
                              use_bias=False, rngs=rngs)
        self.norm2 = nnx.LayerNorm(dim, rngs=rngs)
        self.highways = nnx.List([_Highway(dim, rngs) for _ in range(n_highways)])
        self.post = nnx.Linear(dim, dim_out, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)
        self.dim_out = dim_out

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        mask = sequence_mask(lengths, x.shape[1]) if lengths is not None else None
        x = self.pre(x)
        if mask is not None:
            x = apply_mask(x, mask)
        h = jnp.concatenate([nnx.relu(conv(x)) for conv in self.bank], axis=-1)
        h = self.bank_norm(h)
        # stride-1 max pool over time, window 2 (reference maxpool k2 s1)
        h = jnp.maximum(h, jnp.pad(h, ((0, 0), (0, 1), (0, 0)),
                                   constant_values=-1e9)[:, 1:])
        h = self.norm1(nnx.relu(self.proj1(h)))
        h = self.norm2(self.proj2(h))
        x = x + self.dropout(h, deterministic=deterministic)
        for hw in self.highways:
            x = hw(x)
        x = self.post(x)
        return apply_mask(x, mask) if mask is not None else x


class ConformerBlock(nnx.Module):
    """Macaron FF -> MHSA -> depthwise conv module -> FF, pre-LN."""

    def __init__(self, dim: int, n_heads: int = 4, kernel_size: int = 7,
                 dropout: float = 0.1, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.ff1_norm = nnx.LayerNorm(dim, rngs=rngs)
        self.ff1a = nnx.Linear(dim, 4 * dim, rngs=rngs)
        self.ff1b = nnx.Linear(4 * dim, dim, rngs=rngs)
        self.attn_norm = nnx.LayerNorm(dim, rngs=rngs)
        self.attn = nnx.MultiHeadAttention(
            num_heads=n_heads, in_features=dim, qkv_features=dim,
            dropout_rate=dropout, decode=False, rngs=rngs)
        self.conv_norm = nnx.LayerNorm(dim, rngs=rngs)
        self.pw1 = nnx.Conv(dim, 2 * dim, (1,), rngs=rngs)
        self.dw = nnx.Conv(dim, dim, (kernel_size,), padding="SAME",
                           feature_group_count=dim, rngs=rngs)
        self.dw_norm = nnx.LayerNorm(dim, rngs=rngs)
        self.pw2 = nnx.Conv(dim, dim, (1,), rngs=rngs)
        self.ff2_norm = nnx.LayerNorm(dim, rngs=rngs)
        self.ff2a = nnx.Linear(dim, 4 * dim, rngs=rngs)
        self.ff2b = nnx.Linear(4 * dim, dim, rngs=rngs)
        self.final_norm = nnx.LayerNorm(dim, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)

    def _ff(self, x, norm, a, b, deterministic):
        h = b(self.dropout(nnx.silu(a(norm(x))), deterministic=deterministic))
        return self.dropout(h, deterministic=deterministic)

    def __call__(self, x, mask=None, deterministic=True):
        x = x + 0.5 * self._ff(x, self.ff1_norm, self.ff1a, self.ff1b, deterministic)
        h = self.attn_norm(x)
        attn_mask = None
        if mask is not None:
            attn_mask = mask[:, None, None, :] & mask[:, None, :, None]
        x = x + self.dropout(self.attn(h, h, h, mask=attn_mask,
                                       deterministic=deterministic),
                             deterministic=deterministic)
        h = self.conv_norm(x)
        if mask is not None:
            h = apply_mask(h, mask)
        h = nnx.glu(self.pw1(h), axis=-1)
        # shifted-add depthwise conv (grouped convs lower poorly on TPU; see
        # ops/anti_alias.py + ops.signal.depthwise_conv1d), at the layer's
        # compute dtype so mixed precision isn't silently promoted to fp32
        dt = self.dw.dtype or h.dtype
        h = depthwise_conv1d(h.astype(dt), self.dw.kernel[...].astype(dt),
                             self.dw.bias[...].astype(dt))
        h = nnx.silu(self.dw_norm(h))
        h = self.dropout(self.pw2(h), deterministic=deterministic)
        x = x + h
        x = x + 0.5 * self._ff(x, self.ff2_norm, self.ff2a, self.ff2b, deterministic)
        return self.final_norm(x)


class ConformerEncoder(nnx.Module):
    """Conformer encoder (reference: encoders/conformer_encoder.py:40 over
    torchaudio.models.Conformer): macaron blocks with a depthwise-conv module
    between attention and FF — convolutions catch local phone context that
    pure FFT blocks need many layers for."""

    def __init__(self, dim_in: int, dim_out: int, dim: int = 256, n_layers: int = 4,
                 n_heads: int = 4, kernel_size: int = 7, dropout: float = 0.1,
                 use_remat: bool = False, rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.pre = nnx.Linear(dim_in, dim, rngs=rngs) if dim_in != dim else None
        self.blocks = nnx.List([
            ConformerBlock(dim, n_heads, kernel_size, dropout, rngs=rngs)
            for _ in range(n_layers)
        ])
        self.post = nnx.Linear(dim, dim_out, rngs=rngs) if dim != dim_out else None
        self.dim_out = dim_out
        self.use_remat = use_remat

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        if self.pre is not None:
            x = self.pre(x)
        mask = sequence_mask(lengths, x.shape[1]) if lengths is not None else None
        for blk in self.blocks:
            if self.use_remat:
                x = nnx.remat(
                    lambda b, h: b(h, mask, deterministic=deterministic))(blk, x)
            else:
                x = blk(x, mask, deterministic=deterministic)
        if self.post is not None:
            x = self.post(x)
        return apply_mask(x, mask) if mask is not None else x


class VarianceEncoder(nnx.Module):
    """Multi-kernel conv + bi-LSTM encoder used inside variance predictors
    (reference: encoders/variance_encoder.py:45): parallel convs with kernels
    (3, 7, 13) over the content, fused by one more conv, then a bidirectional
    LSTM and a projection."""

    def __init__(self, dim_in: int, dim_out: int, dim: int = 256,
                 kernel_sizes: tp.Sequence[int] = (3, 7, 13, 3),
                 use_rnn: bool = True, dropout: float = 0.1,
                 rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        first, last = kernel_sizes[:-1], kernel_sizes[-1]
        self.first_convs = nnx.List([
            nnx.Conv(dim_in, dim, (k,), padding="SAME", rngs=rngs) for k in first
        ])
        self.first_norms = nnx.List([nnx.LayerNorm(dim, rngs=rngs) for _ in first])
        self.second_conv = nnx.Conv(len(first) * dim, dim, (last,), padding="SAME",
                                    rngs=rngs)
        self.second_norm = nnx.LayerNorm(dim, rngs=rngs)
        self.use_rnn = use_rnn
        if use_rnn:
            half = dim // 2
            self.fwd = nnx.RNN(nnx.OptimizedLSTMCell(dim, half, rngs=rngs))
            self.bwd = nnx.RNN(nnx.OptimizedLSTMCell(dim, dim - half, rngs=rngs),
                               reverse=True, keep_order=True)
        self.post = nnx.Linear(dim, dim_out, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)
        self.dim_out = dim_out

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        mask = sequence_mask(lengths, x.shape[1]) if lengths is not None else None
        hs = [self.dropout(norm(nnx.silu(conv(x))), deterministic=deterministic)
              for conv, norm in zip(self.first_convs, self.first_norms)]
        h = jnp.concatenate(hs, axis=-1)
        h = self.dropout(self.second_norm(nnx.silu(self.second_conv(h))),
                         deterministic=deterministic)
        if self.use_rnn:
            if mask is not None:
                h = apply_mask(h, mask)
            h = jnp.concatenate([self.fwd(h), self.bwd(h)], axis=-1)
        h = self.post(h)
        return apply_mask(h, mask) if mask is not None else h


class SFEncoder(nnx.Module):
    """Source-filter encoder (reference: encoders/source_filter_encoder.py:56):
    a "source" stream from the content and two "filter" streams from the
    pitch and energy contours (bucketized VarianceEmbeddings), each through a
    base encoder, summed, then a fusion encoder. Call with ``pitch``/``energy``
    keywords (the model forwards aggregate_pitch/aggregate_energy)."""

    def __init__(self, dim_in: int, dim_out: int, dim: int = 256,
                 base: str = "rnn", pitch_interval: tp.Tuple[float, float] = (0.0, 880.0),
                 energy_interval: tp.Tuple[float, float] = (0.0, 150.0),
                 emb_dim: int = 64, rngs: nnx.Rngs = None, **kw):
        from speechflow_tpu.models.tts.common import VarianceEmbedding

        rngs = rngs or nnx.Rngs(0)
        self.pitch_emb = VarianceEmbedding(pitch_interval, 256, emb_dim,
                                           log_scale=True, rngs=rngs)
        self.energy_emb = VarianceEmbedding(energy_interval, 256, emb_dim, rngs=rngs)
        self.pre_source = nnx.Linear(dim_in, dim, rngs=rngs)
        self.pre_pitch = nnx.Linear(emb_dim, dim, rngs=rngs)
        self.pre_energy = nnx.Linear(emb_dim, dim, rngs=rngs)
        enc = TTS_ENCODERS[base]
        self.source_enc = enc(dim_in=dim, dim_out=dim, dim=dim, rngs=rngs)
        self.filter_enc_p = enc(dim_in=dim, dim_out=dim, dim=dim, rngs=rngs)
        self.filter_enc_e = enc(dim_in=dim, dim_out=dim, dim=dim, rngs=rngs)
        self.fusion = enc(dim_in=dim, dim_out=dim_out, dim=dim, rngs=rngs)
        self.dim_out = dim_out

    def __call__(self, x, lengths=None, cond=None, deterministic=True,
                 pitch: tp.Optional[jnp.ndarray] = None,
                 energy: tp.Optional[jnp.ndarray] = None):
        h = self.source_enc(self.pre_source(x), lengths, cond,
                            deterministic=deterministic)
        if pitch is not None:
            hp = self.filter_enc_p(self.pre_pitch(self.pitch_emb(pitch)), lengths,
                                   cond, deterministic=deterministic)
            h = h + hp
        if energy is not None:
            he = self.filter_enc_e(self.pre_energy(self.energy_emb(energy)), lengths,
                                   cond, deterministic=deterministic)
            h = h + he
        return self.fusion(h, lengths, cond, deterministic=deterministic)


class LinguisticConditionEncoder(nnx.Module):
    """Conditions the content on linguistic / LM features via ConditionalLayers
    before a base encoder (reference: encoders/ling_condition.py:30
    LinguisticCondition; cat/add instead of the embedding-stage sum). Call
    with ``ling_feat``/``lm_feat`` keywords."""

    def __init__(self, dim_in: int, dim_out: int, dim: int = 256,
                 base: str = "transformer", method: str = "cat",
                 ling_feat_dim: int = 56, lm_feat_dim: int = 32,
                 n_layers: int = 4, n_heads: int = 4, dropout: float = 0.1,
                 rngs: nnx.Rngs = None, **kw):
        from speechflow_tpu.models.tts.common import ConditionalLayer

        rngs = rngs or nnx.Rngs(0)
        self.ling_cond = ConditionalLayer(method, dim_in, ling_feat_dim, rngs=rngs)
        self.lm_cond = ConditionalLayer(method, dim_in, lm_feat_dim, rngs=rngs)
        self.base = TTS_ENCODERS[base](dim_in=dim_in, dim_out=dim_out, dim=dim,
                                       n_layers=n_layers, n_heads=n_heads,
                                       dropout=dropout, rngs=rngs)
        self.dim_out = dim_out

    def __call__(self, x, lengths=None, cond=None, deterministic=True,
                 ling_feat: tp.Optional[jnp.ndarray] = None,
                 lm_feat: tp.Optional[jnp.ndarray] = None):
        if ling_feat is not None:
            x = self.ling_cond(x, ling_feat)
        if lm_feat is not None:
            x = self.lm_cond(x, lm_feat)
        return self.base(x, lengths, cond, deterministic=deterministic)


TTS_ENCODERS: tp.Dict[str, type] = {
    "dummy": DummyEncoder,
    "cnn": CNNEncoder,
    "rnn": RNNEncoder,
    "transformer": TransformerEncoder,
    "dit": DiTEncoder,
    "vq": VQEncoder,
    "context": ContextEncoder,
}
TTS_ENCODERS.update({
    "cbhg": CBHGEncoder,
    "conformer": ConformerEncoder,
    "variance_encoder": VarianceEncoder,
    "sf": SFEncoder,
    "ling_condition": LinguisticConditionEncoder,
})
