"""Variance predictors & style encoders.

Capability parity with the reference predictor zoo
(tts/acoustic_models/modules/components/variance_predictors/
{tokenlevel_predictor.py:40, framelevel_predictor.py:37,
duration_predictors/token_level_dp.py:28} and style_encoders/style_encoder.py:37):
conv-stack regressors over token/frame content, a log-domain duration
predictor, and a reference-mel style encoder with optional VAE bottleneck.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from speechflow_tpu.models.tts.common import ConvStack
from speechflow_tpu.utils.masks import apply_mask, masked_mean, sequence_mask

__all__ = ["VariancePredictor", "TokenLevelDP", "StyleEncoder", "TTS_VARIANCE_PREDICTORS"]


class VariancePredictor(nnx.Module):
    """Conv stack -> per-position scalar (token- or frame-level is decided by
    what content it is fed)."""

    def __init__(self, dim_in: int, dim: int = 256, n_layers: int = 3,
                 kernel_size: int = 5, dropout: float = 0.1,
                 activation_out: tp.Optional[str] = None, rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.stack = ConvStack(dim_in, dim, dim, n_layers, kernel_size, dropout, rngs=rngs)
        self.out = nnx.Linear(dim, 1, rngs=rngs)
        self.activation_out = activation_out

    def __call__(self, x: jnp.ndarray, lengths=None, deterministic=True) -> jnp.ndarray:
        h = self.stack(x, deterministic=deterministic)
        v = self.out(h)[..., 0]
        if self.activation_out == "softplus":
            v = jax.nn.softplus(v)
        elif self.activation_out == "relu":
            v = nnx.relu(v)
        if lengths is not None:
            v = apply_mask(v, sequence_mask(lengths, v.shape[1]))
        return v


class TokenLevelDP(nnx.Module):
    """Duration predictor in log domain (reference: token_level_dp.py:28):
    predicts log(1 + d); ``durations()`` exponentiates and masks."""

    def __init__(self, dim_in: int, dim: int = 256, n_layers: int = 2,
                 kernel_size: int = 3, dropout: float = 0.1, rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.stack = ConvStack(dim_in, dim, dim, n_layers, kernel_size, dropout, rngs=rngs)
        self.out = nnx.Linear(dim, 1, rngs=rngs)

    def __call__(self, x: jnp.ndarray, lengths=None, deterministic=True) -> jnp.ndarray:
        """Returns log(1+d) predictions."""
        v = self.out(self.stack(x, deterministic=deterministic))[..., 0]
        if lengths is not None:
            v = apply_mask(v, sequence_mask(lengths, v.shape[1]))
        return v

    @staticmethod
    def to_durations(log_d: jnp.ndarray, lengths=None) -> jnp.ndarray:
        d = jnp.maximum(jnp.expm1(log_d), 0.0)
        if lengths is not None:
            d = apply_mask(d, sequence_mask(lengths, d.shape[1]))
        return d


class StyleEncoder(nnx.Module):
    """Reference-mel -> global style embedding, optional VAE bottleneck
    (reference: style_encoders/style_encoder.py:37, GMVAE option simplified to
    a diagonal-Gaussian VAE; returns (emb, (mu, logvar) or None))."""

    def __init__(self, dim_in: int = 100, dim: int = 256, emb_dim: int = 128,
                 use_vae: bool = True, rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.stack = ConvStack(dim_in, dim, dim, n_layers=3, kernel_size=5,
                               dropout=0.0, rngs=rngs)
        self.use_vae = use_vae
        if use_vae:
            self.mu = nnx.Linear(dim, emb_dim, rngs=rngs)
            self.logvar = nnx.Linear(dim, emb_dim, rngs=rngs)
        else:
            self.proj = nnx.Linear(dim, emb_dim, rngs=rngs)
        self.rngs = rngs
        self.emb_dim = emb_dim

    def __call__(self, mel: jnp.ndarray, lengths=None, deterministic=True):
        h = self.stack(mel, deterministic=deterministic)
        mask = sequence_mask(lengths, mel.shape[1]) if lengths is not None else None
        pooled = masked_mean(h, mask, axis=1) if mask is not None else jnp.mean(h, 1)
        if not self.use_vae:
            return self.proj(pooled), None
        mu = self.mu(pooled)
        logvar = jnp.clip(self.logvar(pooled), -8.0, 8.0)
        if deterministic:
            z = mu
        else:
            eps = jax.random.normal(self.rngs.params(), mu.shape)
            z = mu + jnp.exp(0.5 * logvar) * eps
        return z, (mu, logvar)


TTS_VARIANCE_PREDICTORS: tp.Dict[str, type] = {
    "variance": VariancePredictor,
    "token_level_dp": TokenLevelDP,
}
