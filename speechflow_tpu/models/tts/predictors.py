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

__all__ = ["VariancePredictor", "TokenLevelDP", "StyleEncoder",
           "GaussianMixtureVAE", "SignalDiscriminator", "GradTTSFA",
           "TTS_VARIANCE_PREDICTORS"]


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


class GaussianMixtureVAE(nnx.Module):
    """GMVAE bottleneck (reference: style_encoders/style_encoder.py:141 GMVAE):
    a diagonal-Gaussian posterior regularized toward a learned K-component
    Gaussian-mixture prior — styles cluster into discrete modes instead of
    collapsing to one blob. Losses: responsibility-weighted per-component KL
    ('gmvae_gm') + KL of the responsibilities to uniform ('gmvae_cat')."""

    def __init__(self, dim_in: int, latent_dim: int, n_components: int = 16,
                 rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.mean_post = nnx.Linear(dim_in, latent_dim, rngs=rngs)
        self.logvar_post = nnx.Linear(dim_in, latent_dim, rngs=rngs)
        self.mean_priors = nnx.Param(
            jax.random.uniform(rngs.params(), (n_components, latent_dim),
                               minval=-2.0, maxval=2.0))
        self.logvar_priors = nnx.Param(jnp.full((n_components, latent_dim), -1.0))
        self.rngs = rngs

    @staticmethod
    def _normal_logprob(z, mean, logvar):
        return -0.5 * (jnp.log(2 * jnp.pi) + logvar + (z - mean) ** 2 / jnp.exp(logvar))

    @staticmethod
    def _normal_kl(mu_q, lv_q, mu_p, lv_p):
        return 0.5 * (lv_p - lv_q + (jnp.exp(lv_q) + (mu_q - mu_p) ** 2)
                      / jnp.exp(lv_p) - 1.0)

    def __call__(self, pooled: jnp.ndarray, deterministic: bool = True):
        mu = self.mean_post(pooled)
        logvar = jnp.clip(self.logvar_post(pooled), -8.0, 8.0)
        if deterministic:
            z = mu
            return z, {}
        eps = jax.random.normal(self.rngs.params(), mu.shape)
        z = mu + jnp.exp(0.5 * logvar) * eps

        mp = self.mean_priors[...]              # (K, D)
        lp = jnp.clip(self.logvar_priors[...], -8.0, 8.0)
        k = mp.shape[0]
        # responsibilities from the mixture prior's likelihood of the sample
        logp = jnp.sum(self._normal_logprob(z[:, None, :], mp[None], lp[None]), -1)
        resp = jax.nn.softmax(logp, axis=-1)    # (B, K)
        kl_k = jnp.sum(self._normal_kl(mu[:, None, :], logvar[:, None, :],
                                       mp[None], lp[None]), -1)  # (B, K)
        gm = jnp.sum(jnp.mean(resp * kl_k, axis=0))
        cat = jnp.mean(jnp.sum(resp * (jnp.log(resp + 1e-8) + jnp.log(float(k))), -1))
        return z, {"gmvae_gm": gm, "gmvae_cat": cat}

    def sample_prior(self, key, n: int = 1, sigma_multiplier: float = 1.0):
        """Draw style embeddings from a random mixture component (the
        reference's sigma_multiplier inference path)."""
        k_key, n_key = jax.random.split(key)
        idx = jax.random.randint(k_key, (n,), 0, self.mean_priors[...].shape[0])
        mp = self.mean_priors[...][idx]
        std = jnp.exp(0.5 * jnp.clip(self.logvar_priors[...][idx], -8.0, 8.0))
        return mp + sigma_multiplier * std * jax.random.normal(n_key, mp.shape)


class StyleEncoder(nnx.Module):
    """Reference-mel -> global style embedding with an optional variational
    bottleneck (reference: style_encoders/style_encoder.py:37): plain
    diagonal-Gaussian VAE, or a GMVAE (``use_gmvae``) whose losses flow out
    as a dict. Returns (emb, aux) where aux is (mu, logvar), a loss dict
    (GMVAE), or None."""

    def __init__(self, dim_in: int = 100, dim: int = 256, emb_dim: int = 128,
                 use_vae: bool = True, use_gmvae: bool = False,
                 gmvae_n_components: int = 16, rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.stack = ConvStack(dim_in, dim, dim, n_layers=3, kernel_size=5,
                               dropout=0.0, rngs=rngs)
        self.use_vae = use_vae
        self.use_gmvae = use_gmvae
        if use_gmvae:
            self.gmvae = GaussianMixtureVAE(dim, emb_dim, gmvae_n_components,
                                            rngs=rngs)
        elif use_vae:
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
        if self.use_gmvae:
            return self.gmvae(pooled, deterministic=deterministic)
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


class SignalDiscriminator(nnx.Module):
    """Per-position LSGAN discriminator over (context, 1-D signal) pairs.

    Capability parity with the reference SignalDiscriminator
    (tts/acoustic_models/modules/components/discriminators/
    signal_discriminator.py:28, used by TokenLevelPredictorWithDiscriminator
    at tokenlevel_predictor.py:214): a conv trunk encodes the predictor
    context, the scalar signal (real or predicted variance) is projected and
    concatenated, and a sigmoid head scores each position. Both LSGAN sides
    are computed every step inside one jit program — the reference's
    ``current_iter % freq`` alternation maps onto per-loss ``every_iter``
    schedules in the criterion, which gate in-jit without retraces."""

    def __init__(self, ctx_dim: int, dim: int = 192, kernel_size: int = 3,
                 rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.conv1 = nnx.Conv(ctx_dim, dim, (kernel_size,), padding="SAME", rngs=rngs)
        self.norm1 = nnx.LayerNorm(dim, rngs=rngs)
        self.conv2 = nnx.Conv(dim, dim, (kernel_size,), padding="SAME", rngs=rngs)
        self.norm2 = nnx.LayerNorm(dim, rngs=rngs)
        self.signal_proj = nnx.Linear(1, dim, rngs=rngs)
        self.out_conv1 = nnx.Conv(2 * dim, dim, (kernel_size,), padding="SAME", rngs=rngs)
        self.out_norm1 = nnx.LayerNorm(dim, rngs=rngs)
        self.out_conv2 = nnx.Conv(dim, dim, (kernel_size,), padding="SAME", rngs=rngs)
        self.out_norm2 = nnx.LayerNorm(dim, rngs=rngs)
        self.head = nnx.Linear(dim, 1, rngs=rngs)

    def _trunk(self, ctx: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        h = self.norm1(nnx.relu(self.conv1(ctx * mask)))
        return self.norm2(nnx.relu(self.conv2(h * mask)))

    def _prob(self, h: jnp.ndarray, signal: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        s = self.signal_proj(signal[..., None])
        z = jnp.concatenate([h, s], axis=-1)
        z = self.out_norm1(nnx.relu(self.out_conv1(z * mask)))
        z = self.out_norm2(nnx.relu(self.out_conv2(z * mask)))
        return jax.nn.sigmoid(self.head(z)[..., 0])

    def lsgan_losses(self, context: jnp.ndarray, real: jnp.ndarray,
                     fake: jnp.ndarray, lengths: jnp.ndarray) -> tp.Dict[str, jnp.ndarray]:
        """Returns {'disc_loss', 'gen_loss'} with the reference's gradient
        routing: the discriminator side sees detached context/real/fake; the
        generator side lets gradients flow through context and fake."""
        sg = jax.lax.stop_gradient
        mask = sequence_mask(lengths, context.shape[1]).astype(context.dtype)[..., None]

        def mmean(v):
            return jnp.sum(v * mask[..., 0]) / jnp.maximum(jnp.sum(mask), 1.0)

        h_d = self._trunk(sg(context), mask)
        p_real = self._prob(h_d, sg(real), mask)
        p_fake_d = self._prob(h_d, sg(fake), mask)
        disc = mmean((1.0 - p_real) ** 2) + mmean(p_fake_d**2)

        h_g = self._trunk(context, mask)
        p_fake_g = self._prob(h_g, fake, mask)
        gen = mmean((1.0 - p_fake_g) ** 2)
        return {"disc_loss": disc, "gen_loss": gen}


class GradTTSFA(nnx.Module):
    """In-model forced aligner (reference: tts/acoustic_models/modules/
    components/forced_alignment/gardtts_fa.py:86 GradTTSFA).

    Learns durations without a pre-run external aligner: a conv text encoder
    maps content to per-token mel means mu_x; MAS (device lax.scan DP,
    ops/mas.py) finds the most likely monotonic alignment between mu_x and
    the target mel under an isotropic Gaussian prior; the alignment yields
    (a) MAS durations used for length regulation and as supervision for the
    internal log-duration predictor, and (b) a Gaussian prior loss pulling
    mu_x toward the aligned mel frames. At inference the duration predictor
    output exp(logw) is used (logw is trained to log(d + 1e-8))."""

    def __init__(self, dim_in: int, feat_dim: int, dim: int = 256,
                 dp_dim: int = 256, rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.encoder = ConvStack(dim_in, dim, dim, n_layers=2, kernel_size=3,
                                 dropout=0.1, rngs=rngs)
        self.proj = nnx.Linear(dim, feat_dim, rngs=rngs)
        self.dp = ConvStack(dim, dp_dim, dp_dim, n_layers=2, kernel_size=3,
                            dropout=0.1, rngs=rngs)
        self.dp_out = nnx.Linear(dp_dim, 1, rngs=rngs)
        self.feat_dim = feat_dim

    def _encode(self, x: jnp.ndarray, deterministic: bool):
        h = self.encoder(x, deterministic=deterministic)
        mu_x = self.proj(h)
        logw = self.dp_out(self.dp(h, deterministic=deterministic))[..., 0]
        return mu_x, logw

    def predict(self, x: jnp.ndarray, token_lengths: jnp.ndarray,
                deterministic: bool = True) -> jnp.ndarray:
        """Inference durations: exp(logw), masked."""
        _, logw = self._encode(x, deterministic)
        d = jnp.exp(logw)
        return apply_mask(d, sequence_mask(token_lengths, d.shape[1]))

    def align(self, x: jnp.ndarray, token_lengths: jnp.ndarray,
              mel: jnp.ndarray, mel_lengths: jnp.ndarray,
              deterministic: bool = False):
        """Training path: MAS durations + (duration, prior) losses."""
        from speechflow_tpu.ops.mas import maximum_path

        mu_x, logw = self._encode(x, deterministic)
        c = self.feat_dim
        # log N(y_t; mu_n, I) as matmuls: -(|y|^2 - 2 mu.y + |mu|^2)/2 + const
        y_sq = -0.5 * jnp.einsum("btc,btc->bt", mel, mel)[:, None, :]
        cross = jnp.einsum("bnc,btc->bnt", mu_x, mel)
        mu_sq = -0.5 * jnp.sum(mu_x**2, axis=-1)[:, :, None]
        log_prior = y_sq + cross + mu_sq - 0.5 * jnp.log(2 * jnp.pi) * c

        attn = jax.lax.stop_gradient(
            maximum_path(jax.lax.stop_gradient(log_prior), token_lengths, mel_lengths))
        dura = jnp.sum(attn, axis=-1)  # (B, N)

        tok_mask = sequence_mask(token_lengths, x.shape[1]).astype(x.dtype)
        logw_tgt = jnp.log(dura + 1e-8) * tok_mask
        dura_loss = jnp.sum(jnp.abs(logw * tok_mask - logw_tgt)) / jnp.maximum(
            jnp.sum(tok_mask), 1.0)

        mu_y = jnp.einsum("bnt,bnc->btc", attn, mu_x)
        mel_mask = sequence_mask(mel_lengths, mel.shape[1]).astype(x.dtype)[..., None]
        prior = jnp.sum(0.5 * ((mel - mu_y) ** 2 + jnp.log(2 * jnp.pi)) * mel_mask)
        prior_loss = prior / jnp.maximum(jnp.sum(mel_mask) * c, 1.0)

        return dura, attn, {"fa_duration": dura_loss, "fa_prior": prior_loss}


TTS_VARIANCE_PREDICTORS: tp.Dict[str, type] = {
    "variance": VariancePredictor,
    "token_level_dp": TokenLevelDP,
    "signal_discriminator": SignalDiscriminator,
    "gradtts_fa": GradTTSFA,
}
