"""GlowTTS forced aligner: text encoder + flow decoder + on-device MAS.

Capability parity with the reference forced-alignment model
(tts/forced_alignment/model/glow_tts.py, MAS at :149 with the numpy/numba DP
moved on device per SURVEY §2.4 item 2): the text encoder produces per-token
Gaussians (mu, logstd); the flow decoder maps mel frames to latents z with a
log-determinant; the token-frame log-likelihood grid
log N(z_t; mu_n, sigma_n) is three matmuls; ``ops.maximum_path`` finds the
monotonic alignment; training maximizes flow MLE under the hard alignment +
duration regression. ``align()`` converts the path to per-token frame counts
and timestamps (the annotator consumes these to emit TextGrids).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from speechflow_tpu import ops
from speechflow_tpu.models.aligner.flows import FlowSpecDecoder
from speechflow_tpu.models.tts.encoders import TransformerEncoder
from speechflow_tpu.training.base_model import BaseModelParams
from speechflow_tpu.utils.masks import sequence_mask

__all__ = ["GlowTTSAligner", "GlowTTSParams"]


class GlowTTSParams(BaseModelParams):
    n_symbols: int = 100
    n_speakers: int = 1
    n_langs: int = 1
    n_mels: int = 100
    encoder_dim: int = 192
    encoder_layers: int = 4
    encoder_heads: int = 2
    n_flows: int = 6
    flow_hidden: int = 192
    speaker_emb_dim: int = 64
    lang_emb_dim: int = 16
    mean_only: bool = False           # predict mu only (logstd = 0)


class GlowTTSAligner(nnx.Module):
    def __init__(self, params: GlowTTSParams, rngs: tp.Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.p = params
        p = params
        self.token_emb = nnx.Embed(p.n_symbols, p.encoder_dim, rngs=rngs)
        cond_dim = 0
        if p.n_speakers > 1:
            self.speaker_emb = nnx.Embed(p.n_speakers, p.speaker_emb_dim, rngs=rngs)
            cond_dim += p.speaker_emb_dim
        if p.n_langs > 1:
            self.lang_emb = nnx.Embed(p.n_langs, p.lang_emb_dim, rngs=rngs)
            cond_dim += p.lang_emb_dim
        self.cond_dim = cond_dim or None
        self.encoder = TransformerEncoder(dim_in=p.encoder_dim, dim_out=p.encoder_dim,
                                          dim=p.encoder_dim, n_layers=p.encoder_layers,
                                          n_heads=p.encoder_heads, rngs=rngs)
        out_mult = 1 if p.mean_only else 2
        self.proj = nnx.Linear(p.encoder_dim, out_mult * p.n_mels, rngs=rngs)
        self.dur_proj = nnx.Linear(p.encoder_dim, 1, rngs=rngs)
        self.flow = FlowSpecDecoder(p.n_mels, p.n_flows, p.flow_hidden,
                                    cond_dim=self.cond_dim, rngs=rngs)

    # -- pieces -----------------------------------------------------------------

    def _condition(self, inputs) -> tp.Optional[jnp.ndarray]:
        parts = []
        if self.p.n_speakers > 1 and inputs.speaker_id is not None:
            parts.append(self.speaker_emb(jnp.maximum(inputs.speaker_id, 0)))
        if self.p.n_langs > 1 and inputs.lang_id is not None:
            parts.append(self.lang_emb(jnp.maximum(inputs.lang_id, 0)))
        return jnp.concatenate(parts, axis=-1) if parts else None

    def encode_text(self, inputs, training: bool):
        x = self.token_emb(inputs.transcription)
        h = self.encoder(x, inputs.transcription_lengths, deterministic=not training)
        stats = self.proj(h)
        if self.p.mean_only:
            mu, logstd = stats, jnp.zeros_like(stats)
        else:
            mu, logstd = jnp.split(stats, 2, axis=-1)
            logstd = jnp.clip(logstd, -7.0, 5.0)
        log_dur = self.dur_proj(jax.lax.stop_gradient(h))[..., 0]
        return mu, logstd, log_dur

    @staticmethod
    def likelihood_grid(z, mu, logstd):
        """log N(z_t; mu_n, sigma_n) summed over mels -> (B, N, T), matmul form."""
        # sum_d [-0.5 log(2pi) - logstd - 0.5 (z - mu)^2 / sigma^2]
        inv_var = jnp.exp(-2.0 * logstd)                       # (B, N, D)
        const = jnp.sum(-0.5 * jnp.log(2 * jnp.pi) - logstd
                        - 0.5 * mu**2 * inv_var, axis=-1)      # (B, N)
        cross = jnp.einsum("bnd,btd->bnt", mu * inv_var, z)    # MXU
        quad = -0.5 * jnp.einsum("bnd,btd->bnt", inv_var, z * z)
        return quad + cross + const[..., None]

    # -- training forward ------------------------------------------------------------

    def __call__(self, inputs, training: bool = True):
        """Returns dict with z, logdet, path, log-durations, token stats."""
        mu, logstd, log_dur = self.encode_text(inputs, training)
        cond = self._condition(inputs)
        z, logdet = self.flow(inputs.mel, inputs.mel_lengths, cond)
        t2 = (z.shape[1] // 2) * 2
        z = z[:, :t2]
        mel_lens = jnp.minimum(inputs.mel_lengths // 2 * 2, t2)

        grid = self.likelihood_grid(z, mu, logstd)
        path = jax.lax.stop_gradient(
            ops.maximum_path(grid, inputs.transcription_lengths, mel_lens))

        # align token stats to frames through the hard path (matmuls)
        mu_t = jnp.einsum("bnt,bnd->btd", path, mu)
        logstd_t = jnp.einsum("bnt,bnd->btd", path, logstd)
        durations = path.sum(axis=-1)  # (B, N) frames per token

        return {
            "z": z, "logdet": logdet, "mel_lengths": mel_lens,
            "mu_t": mu_t, "logstd_t": logstd_t,
            "path": path, "durations": durations, "log_dur_pred": log_dur,
        }

    # -- alignment API -----------------------------------------------------------------

    def align(self, inputs) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
        """(durations (B, N) in frames, path (B, N, T)) for annotation."""
        out = self(inputs, training=False)
        return out["durations"], out["path"]

    def generate(self, inputs, durations: tp.Optional[jnp.ndarray] = None,
                 noise_scale: float = 0.33, key=None,
                 t_out: tp.Optional[int] = None):
        """Inverse flow synthesis (GlowTTSEvaluationInterface.synthesize
        analogue): expand token Gaussians by (predicted) durations and invert."""
        mu, logstd, log_dur = self.encode_text(inputs, training=False)
        if durations is None:
            durations = jnp.round(jnp.maximum(jnp.expm1(log_dur), 0.0))
        t_out = t_out or int(self.p.n_mels * 4)
        t_out = (t_out // 2) * 2
        mu_f, _ = ops.length_regulate_hard(mu, durations, t_out)
        logstd_f, _ = ops.length_regulate_hard(logstd, durations, t_out)
        lens = jnp.clip(durations.sum(-1).astype(jnp.int32), 2, t_out) // 2 * 2
        key = key if key is not None else jax.random.PRNGKey(0)
        z = mu_f + jnp.exp(logstd_f) * noise_scale * jax.random.normal(key, mu_f.shape)
        mel, _ = self.flow(z, lens, self._condition(inputs), reverse=True)
        return mel, lens
