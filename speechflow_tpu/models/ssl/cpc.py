"""Trainable self-supervised speech representation model (CPC).

The reference's SSLProcessor loads pretrained Wav2Vec2/WavLM/Hubert models
(speechflow/data_pipeline/datasample_processors/audio_processors.py:334 over
ssl_models). None are downloadable offline, so the framework ships the
self-supervision itself: Contrastive Predictive Coding — a strided-conv
waveform encoder produces latents z_t, an autoregressive GRU summarizes them
into contexts c_t, and InfoNCE trains step-specific projections of c_t to
pick the true future z_{t+k} against in-batch negatives. The context stream
c_t is the `ssl_feat` the data pipeline consumes (make_cpc_hook in
data/processors/embeddings.py).

TPU notes: the encoder is a plain strided-conv stack (one fused XLA program),
the InfoNCE logits are one (B*T', B*T') matmul per step offset — MXU-shaped —
and everything static-shape jits.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.training.base_model import BaseModelParams

__all__ = ["CPCParams", "CPCModel", "cpc_infonce_loss"]


class CPCParams(BaseModelParams):
    sample_rate: int = 24000
    channels: int = 128
    latent_dim: int = 128
    context_dim: int = 128
    strides: tp.Tuple[int, ...] = (5, 4, 2, 2, 2)   # total hop = 160 @ 16k-style
    kernel_sizes: tp.Tuple[int, ...] = (10, 8, 4, 4, 4)
    n_predict_steps: int = 4


class CPCModel(nnx.Module):
    def __init__(self, params: CPCParams, rngs: tp.Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        p = params
        self.p = p
        ch_in = 1
        self.encoder = nnx.List([])
        self.enc_norms = nnx.List([])
        for k, s in zip(p.kernel_sizes, p.strides):
            self.encoder.append(nnx.Conv(ch_in, p.channels, (k,), strides=(s,),
                                         padding="SAME", rngs=rngs))
            self.enc_norms.append(nnx.LayerNorm(p.channels, rngs=rngs))
            ch_in = p.channels
        self.enc_proj = nnx.Linear(p.channels, p.latent_dim, rngs=rngs)
        self.context = nnx.RNN(nnx.GRUCell(p.latent_dim, p.context_dim, rngs=rngs))
        self.predictors = nnx.List([
            nnx.Linear(p.context_dim, p.latent_dim, rngs=rngs)
            for _ in range(p.n_predict_steps)
        ])
        self.hop = int(np.prod(p.strides))
        self.dim = p.context_dim

    def encode(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, T) -> (B, T', latent_dim) local latents z."""
        x = wav[..., None]
        for conv, norm in zip(self.encoder, self.enc_norms):
            x = norm(nnx.gelu(conv(x)))
        return self.enc_proj(x)

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, T) -> (B, T', context_dim) SSL features (the c_t stream)."""
        return self.context(self.encode(wav))

    def features_and_latents(self, wav: jnp.ndarray):
        z = self.encode(wav)
        return self.context(z), z


def cpc_infonce_loss(model: CPCModel, wav: jnp.ndarray) -> jnp.ndarray:
    """InfoNCE over in-batch negatives, averaged over predict steps."""
    c, z = model.features_and_latents(wav)
    b, t, d = z.shape
    total = 0.0
    for k, head in enumerate(model.predictors, start=1):
        if t <= k:
            continue
        pred = head(c[:, :-k])                    # (B, T-k, D) predicted z_{t+k}
        tgt = z[:, k:]                            # (B, T-k, D)
        n = b * (t - k)
        pred_f = pred.reshape(n, d)
        tgt_f = tgt.reshape(n, d)
        logits = pred_f @ tgt_f.T / jnp.sqrt(d)   # (N, N): MXU-shaped
        labels = jnp.arange(n)
        total = total + jnp.mean(
            optax_softmax_ce(logits, labels))
    return total / len(model.predictors)


def optax_softmax_ce(logits, labels):
    import optax

    return optax.softmax_cross_entropy_with_integer_labels(logits, labels)


def train_cpc(waves: tp.Sequence[np.ndarray], sr: int = 24000, steps: int = 150,
              batch: int = 4, chunk_s: float = 1.0, lr: float = 2e-4,
              seed: int = 0, params: tp.Optional[CPCParams] = None) -> CPCModel:
    """Train CPC on raw waveforms (random fixed-length chunks)."""
    import optax

    rng = np.random.default_rng(seed)
    p = params or CPCParams(sample_rate=sr)
    model = CPCModel(p, rngs=nnx.Rngs(seed))
    opt = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)
    n = int(chunk_s * sr)

    @nnx.jit
    def step(model, opt, wav):
        loss, grads = nnx.value_and_grad(
            lambda m: cpc_infonce_loss(m, wav))(model)
        opt.update(model, grads)
        return loss

    last = None
    for _ in range(steps):
        xs = []
        for _ in range(batch):
            w = waves[int(rng.integers(0, len(waves)))]
            if len(w) < n:
                w = np.pad(w, (0, n - len(w)))
            start = int(rng.integers(0, max(len(w) - n, 1)))
            xs.append(w[start : start + n])
        last = step(model, opt, jnp.asarray(np.stack(xs)))
    return model
