"""Decoder zoo: frame-level content -> spectrogram.

Capability parity with the reference decoders
(tts/acoustic_models/modules/components/decoders/): ``WrapperDecoder`` wraps
any encoder + output projection (wrapper_decoder), ``CFMDecoder``
(cfm_decoder.py:95 + common/stable_tts/flow_matching.py:13): conditional flow
matching — a prior projection produces mu; training draws t ~ cosine-warped
uniform, builds x_t = (1-(1-sigma_min)t)·z + t·target and regresses the DiT
estimator onto u = target - (1-sigma_min)·z (masked MSE); inference runs a
fixed-step Euler solve over the cosine time grid via ``lax.scan`` with
optional classifier-free guidance (content/condition dropout with learned
fake embeddings at train time).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from speechflow_tpu.models.tts.common import sinusoidal_embedding
from speechflow_tpu.models.tts.encoders import TTS_ENCODERS, DiTEncoder
from speechflow_tpu.utils.masks import apply_mask, sequence_mask

__all__ = ["WrapperDecoder", "CFMDecoder", "TTS_DECODERS"]


class WrapperDecoder(nnx.Module):
    def __init__(self, dim_in: int, dim_out: int, inner: str = "transformer",
                 dim: int = 256, n_layers: int = 4, rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.enc = TTS_ENCODERS[inner](dim_in=dim_in, dim_out=dim, dim=dim,
                                       n_layers=n_layers, rngs=rngs)
        self.out = nnx.Linear(dim, dim_out, rngs=rngs)
        self.dim_out = dim_out

    def __call__(self, x, lengths=None, cond=None, deterministic=True):
        h = self.enc(x, lengths, cond, deterministic=deterministic)
        out = self.out(h)
        if lengths is not None:
            out = apply_mask(out, sequence_mask(lengths, out.shape[1]))
        return out


class CFMDecoder(nnx.Module):
    """Matcha/StableTTS-style conditional flow matching decoder."""

    def __init__(self, dim_in: int, dim_out: int, dim: int = 256, n_layers: int = 4,
                 n_heads: int = 4, cond_dim: int = 256, sigma_min: float = 1e-4,
                 n_timesteps: int = 30, temperature: float = 0.667,
                 cfg_scale: float = 0.0, cfg_dropout: float = 0.1,
                 rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.prior = nnx.Linear(dim_in, dim_out, rngs=rngs)
        # estimator input: x_t ++ mu ++ content-projection
        self.estimator = DiTEncoder(dim_in=2 * dim_out + dim_in, dim_out=dim_out,
                                    dim=dim, n_layers=n_layers, n_heads=n_heads,
                                    cond_dim=cond_dim + dim, rngs=rngs)
        self.time_mlp1 = nnx.Linear(dim, dim, rngs=rngs)
        self.time_mlp2 = nnx.Linear(dim, dim, rngs=rngs)
        self.fake_content = nnx.Param(jnp.zeros((dim_in,)))
        self.fake_condition = nnx.Param(jnp.zeros((cond_dim,)))
        self.sigma_min = sigma_min
        self.n_timesteps = n_timesteps
        self.temperature = temperature
        self.cfg_scale = cfg_scale
        self.cfg_dropout = cfg_dropout
        self.cond_dim = cond_dim
        self.dim = dim
        self.dim_out = dim_out
        self.rngs = rngs

    # -- shared -----------------------------------------------------------

    def _time_emb(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.time_mlp2(nnx.silu(self.time_mlp1(
            sinusoidal_embedding(t * 1000.0, self.dim))))

    def _dphi(self, x_t, mu, content, t, cond, lengths, deterministic=True):
        c = jnp.zeros((x_t.shape[0], self.cond_dim), x_t.dtype) if cond is None else cond
        c_full = jnp.concatenate([c, self._time_emb(t)], axis=-1)
        est_in = jnp.concatenate([x_t, mu, content], axis=-1)
        return self.estimator(est_in, lengths, c_full, deterministic=deterministic)

    # -- training --------------------------------------------------------------

    def forward_train(self, content, lengths, target, cond=None):
        """Returns (mu, cfm_loss_terms dict). ``target``: (B, T, dim_out)."""
        mu = self.prior(content)
        b = content.shape[0]
        k1, k2, k3, k4 = jax.random.split(self.rngs.params(), 4)

        # CFG dropout with learned fake content/condition (reference :153-173)
        if self.cfg_dropout > 0:
            drop_c = jax.random.bernoulli(k3, self.cfg_dropout, (b, 1, 1))
            content = jnp.where(drop_c, self.fake_content[...][None, None, :], content)
            if cond is not None:
                drop_e = jax.random.bernoulli(k4, self.cfg_dropout, (b, 1))
                cond = jnp.where(drop_e, self.fake_condition[...][None, :], cond)

        # cosine-warped time (reference flow_matching.py:147-161)
        u = jax.random.uniform(k1, (b,))
        t = 1.0 - jnp.cos(u * 0.5 * jnp.pi)
        z = jax.random.normal(k2, target.shape)
        t_ = t[:, None, None]
        x_t = (1.0 - (1.0 - self.sigma_min) * t_) * z + t_ * target
        flow_target = target - (1.0 - self.sigma_min) * z

        v = self._dphi(x_t, jax.lax.stop_gradient(mu), content, t, cond, lengths,
                       deterministic=False)
        mask = sequence_mask(lengths, target.shape[1])[..., None].astype(target.dtype)
        cfm_loss = jnp.sum(((v - flow_target) ** 2) * mask) / jnp.maximum(
            jnp.sum(mask) * target.shape[-1], 1.0)
        return mu, {"cfm": cfm_loss}

    # -- inference --------------------------------------------------------------

    def generate(self, content, lengths, cond=None, key=None,
                 n_timesteps: tp.Optional[int] = None):
        mu = self.prior(content)
        n_steps = n_timesteps or self.n_timesteps
        key = key if key is not None else self.rngs.params()
        # noise follows the prior's dtype: with bf16 weights the whole Euler
        # solve stays bf16 (f32 noise would promote every matmul back to f32)
        z = jax.random.normal(key, mu.shape, dtype=mu.dtype) * self.temperature

        # cosine time grid 1 - cos(pi/2 * s)
        s = jnp.linspace(0.0, 1.0, n_steps + 1)
        ts = 1.0 - jnp.cos(0.5 * jnp.pi * s)
        dts = ts[1:] - ts[:-1]
        b = mu.shape[0]

        if self.cfg_scale > 0:
            # batched CFG: one estimator call on a doubled batch instead of
            # two sequential calls — halves launch count and keeps the MXU
            # busy with a single larger matmul program per step
            fake_c = jnp.broadcast_to(self.fake_content[...][None, None, :], content.shape)
            content2 = jnp.concatenate([content, fake_c], axis=0)
            mu2 = jnp.concatenate([mu, mu], axis=0)
            if cond is None:
                cond2 = jnp.concatenate(
                    [jnp.zeros((b, self.cond_dim), mu.dtype),
                     jnp.broadcast_to(self.fake_condition[...][None, :],
                                      (b, self.cond_dim))], axis=0)
            else:
                cond2 = jnp.concatenate(
                    [cond, jnp.broadcast_to(self.fake_condition[...][None, :],
                                            cond.shape)], axis=0)
            lengths2 = jnp.concatenate([lengths, lengths], axis=0)

        def euler_step(x, inp):
            t, dt = inp
            if self.cfg_scale > 0:
                tb2 = jnp.full((2 * b,), t)
                v2 = self._dphi(jnp.concatenate([x, x], axis=0), mu2, content2,
                                tb2, cond2, lengths2)
                v_c, v_un = v2[:b], v2[b:]
                v = v_c + self.cfg_scale * (v_c - v_un)
            else:
                tb = jnp.full((b,), t)
                v = self._dphi(x, mu, content, tb, cond, lengths)
            return x + dt * v, None

        x, _ = jax.lax.scan(euler_step, z, (ts[:-1], dts))
        return mu, apply_mask(x, sequence_mask(lengths, x.shape[1]))


TTS_DECODERS: tp.Dict[str, type] = {
    "wrapper": WrapperDecoder,
    "cfm": CFMDecoder,
}
