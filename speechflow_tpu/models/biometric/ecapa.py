"""Speaker-embedding network (ECAPA-TDNN class).

Capability parity with the reference biometric models
(speechflow/data_pipeline/datasample_processors/biometric_processors.py:33 —
speechbrain ECAPA / wespeaker ResNet backends): a TDNN trunk with SE-res
blocks and attentive statistics pooling over log-mel input, producing
L2-normalized speaker embeddings. The reference downloads pretrained weights;
in this zero-egress environment the embedder is *trainable in-framework*
(examples/biometric trains it with a triplet objective) and pretrained HF
weights can be injected via the processor hook.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import nnx

from speechflow_tpu.training.base_model import BaseModelParams
from speechflow_tpu.utils.masks import masked_mean, sequence_mask

__all__ = ["ECAPAParams", "ECAPAEmbedder"]


class ECAPAParams(BaseModelParams):
    n_mels: int = 80
    channels: int = 256
    emb_dim: int = 192
    n_blocks: int = 3


class _SERes1D(nnx.Module):
    def __init__(self, channels: int, kernel_size: int, dilation: int, rngs: nnx.Rngs):
        self.conv1 = nnx.Conv(channels, channels, (1,), rngs=rngs)
        self.conv2 = nnx.Conv(channels, channels, (kernel_size,),
                              kernel_dilation=(dilation,), padding="SAME", rngs=rngs)
        self.conv3 = nnx.Conv(channels, channels, (1,), rngs=rngs)
        self.se1 = nnx.Linear(channels, channels // 8, rngs=rngs)
        self.se2 = nnx.Linear(channels // 8, channels, rngs=rngs)
        self.norm = nnx.LayerNorm(channels, rngs=rngs)

    def __call__(self, x):
        h = nnx.relu(self.conv1(x))
        h = nnx.relu(self.conv2(h))
        h = self.conv3(h)
        s = jnp.mean(h, axis=1)                     # squeeze
        s = nnx.sigmoid(self.se2(nnx.relu(self.se1(s))))
        return self.norm(x + h * s[:, None, :])


class ECAPAEmbedder(nnx.Module):
    def __init__(self, params: ECAPAParams, rngs: tp.Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        p = params
        self.pre = nnx.Conv(p.n_mels, p.channels, (5,), padding="SAME", rngs=rngs)
        self.blocks = nnx.List([
            _SERes1D(p.channels, 3, 2 ** (i + 1), rngs) for i in range(p.n_blocks)
        ])
        self.cat_proj = nnx.Conv(p.channels * p.n_blocks, p.channels, (1,), rngs=rngs)
        # attentive statistics pooling
        self.attn1 = nnx.Conv(p.channels, p.channels // 2, (1,), rngs=rngs)
        self.attn2 = nnx.Conv(p.channels // 2, p.channels, (1,), rngs=rngs)
        self.out = nnx.Linear(2 * p.channels, p.emb_dim, rngs=rngs)
        self.p = params

    def __call__(self, mel: jnp.ndarray,
                 lengths: tp.Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """(B, T, n_mels) log-mel -> (B, emb_dim) L2-normalized embedding."""
        x = nnx.relu(self.pre(mel))
        feats = []
        for blk in self.blocks:
            x = blk(x)
            feats.append(x)
        x = nnx.relu(self.cat_proj(jnp.concatenate(feats, axis=-1)))

        w = self.attn2(jnp.tanh(self.attn1(x)))
        if lengths is not None:
            mask = sequence_mask(lengths, x.shape[1])[..., None]
            w = jnp.where(mask, w, -1e9)
        w = nnx.softmax(w, axis=1)
        mean = jnp.sum(x * w, axis=1)
        var = jnp.sum((x**2) * w, axis=1) - mean**2
        std = jnp.sqrt(jnp.clip(var, 1e-6, None))
        emb = self.out(jnp.concatenate([mean, std], axis=-1))
        return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-9)


def triplet_loss(anchor, positive, negative, margin: float = 0.3) -> jnp.ndarray:
    """Cosine triplet loss for speaker verification (examples/biometric)."""
    pos = jnp.sum(anchor * positive, -1)
    neg = jnp.sum(anchor * negative, -1)
    return jnp.mean(jnp.maximum(0.0, margin - pos + neg))
