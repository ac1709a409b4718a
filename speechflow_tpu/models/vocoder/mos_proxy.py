"""Trainable MOS-proxy: a no-label quality predictor for vocoder validation.

The reference validates vocoders with pretrained UTMOS/PESQ-class models
(tts/vocoders/vocos/metrics/utmos.py:18); none are downloadable offline, so
the framework trains its own DNSMOS-style proxy: clean corpus audio is
assigned the top score and synthetically degraded copies (additive noise,
clipping, lowpass, mu-law quantization, reverb — the augmentation handlers'
math) get scores that fall with degradation strength. A small conv net over
log-mel regresses the score; the result plugs into GANTrainer's ``mos_hook``
and the vocoder metrics' MOSHook slot.

This is a *relative* quality signal (tracks degradation monotonically), not a
calibrated human MOS — exactly what GAN-training progress tracking needs.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.training.base_model import BaseModelParams

__all__ = ["MOSProxyParams", "MOSProxy", "degrade", "train_mos_proxy",
           "MOSProxyHook"]


class MOSProxyParams(BaseModelParams):
    sample_rate: int = 24000
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 64
    dim: int = 64
    n_layers: int = 3


class MOSProxy(nnx.Module):
    def __init__(self, params: MOSProxyParams, rngs: tp.Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        p = params
        self.p = p
        dims = [p.n_mels] + [p.dim] * p.n_layers
        self.convs = nnx.List([
            nnx.Conv(dims[i], dims[i + 1], (5,), strides=(2,), padding="SAME",
                     rngs=rngs)
            for i in range(p.n_layers)
        ])
        self.norms = nnx.List([nnx.LayerNorm(p.dim, rngs=rngs)
                               for _ in range(p.n_layers)])
        self.head = nnx.Linear(p.dim, 1, rngs=rngs)

    def _mel(self, wav: jnp.ndarray) -> jnp.ndarray:
        from speechflow_tpu import ops

        mag = ops.magnitude(wav, self.p.n_fft, self.p.hop_length)
        return ops.amp_to_db(ops.linear_to_mel(mag, self.p.sample_rate,
                                               self.p.n_mels))

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, T) waveform -> (B,) predicted score in [1, 5]."""
        x = self._mel(wav)
        for conv, norm in zip(self.convs, self.norms):
            x = norm(nnx.relu(conv(x)))
        pooled = jnp.mean(x, axis=1)
        return 1.0 + 4.0 * nnx.sigmoid(self.head(pooled)[..., 0])


def degrade(wav: np.ndarray, sr: int, level: float, rng,
            kind: tp.Optional[int] = None) -> np.ndarray:
    """Apply a degradation at ``level`` in [0, 1] (0 = clean). ``kind``:
    0 = additive noise, 1 = clipping, 2 = lowpass, 3 = quantization;
    None picks randomly."""
    from scipy.signal import butter, sosfiltfilt

    kind = rng.integers(0, 4) if kind is None else kind
    out = wav.astype(np.float64)
    if level <= 1e-6:
        return wav.astype(np.float32)
    if kind == 0:  # additive noise: SNR 30 dB (level 0) -> 0 dB (level 1)
        snr = 30.0 * (1.0 - level)
        noise = rng.standard_normal(len(out))
        scale = np.sqrt((np.mean(out**2) + 1e-12)
                        / (np.mean(noise**2) * 10 ** (snr / 10)))
        out = out + scale * noise
    elif kind == 1:  # clipping
        thr = np.quantile(np.abs(out), 1.0 - 0.4 * level) + 1e-9
        out = np.clip(out, -thr, thr)
    elif kind == 2:  # lowpass: nyquist (level 0) -> 1 kHz (level 1)
        cutoff = sr / 2 * (1.0 - 0.9 * level) + 100
        sos = butter(6, min(cutoff, sr / 2 - 100), btype="low", fs=sr, output="sos")
        out = sosfiltfilt(sos, out)
    else:  # coarse quantization: 12 bits (level 0) -> 3 bits (level 1)
        bits = 12 - 9 * level
        q = 2.0 ** (bits - 1)
        out = np.round(out * q) / q
    return out.astype(np.float32)


def train_mos_proxy(waves: tp.Sequence[np.ndarray], sr: int = 24000,
                    steps: int = 200, batch: int = 8, chunk_s: float = 1.0,
                    lr: float = 1e-3, seed: int = 0,
                    params: tp.Optional[MOSProxyParams] = None) -> MOSProxy:
    """Self-supervised training: score = 5 - 4 * degradation level."""
    import optax

    rng = np.random.default_rng(seed)
    p = params or MOSProxyParams(sample_rate=sr)
    model = MOSProxy(p, rngs=nnx.Rngs(seed))
    opt = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)
    n = int(chunk_s * sr)

    @nnx.jit
    def step(model, opt, wav, target):
        def loss_fn(m):
            return jnp.mean((m(wav) - target) ** 2)

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    for _ in range(steps):
        xs, ys = [], []
        for _ in range(batch):
            w = waves[int(rng.integers(0, len(waves)))]
            if len(w) < n:
                w = np.pad(w, (0, n - len(w)))
            start = int(rng.integers(0, max(len(w) - n, 1)))
            chunk = w[start : start + n]
            level = float(rng.uniform(0.0, 1.0)) if rng.uniform() > 0.3 else 0.0
            xs.append(degrade(chunk, sr, level, rng))
            ys.append(5.0 - 4.0 * level)
        step(model, opt, jnp.asarray(np.stack(xs)), jnp.asarray(ys, jnp.float32))
    return model


class MOSProxyHook:
    """Callable matching the metrics.MOSHook / GANTrainer mos_hook contract:
    (wav, sr) -> float score. Loads a state_io checkpoint or wraps a model."""

    def __init__(self, model_or_ckpt):
        if isinstance(model_or_ckpt, str) or hasattr(model_or_ckpt, "__fspath__"):
            from speechflow_tpu.utils.state_io import load_module

            self.model, _ = load_module(MOSProxy, MOSProxyParams, model_or_ckpt)
        else:
            self.model = model_or_ckpt

    def __call__(self, wav: np.ndarray, sr: int) -> tp.Optional[float]:
        if sr != self.model.p.sample_rate:
            from scipy.signal import resample_poly
            import math

            g = math.gcd(self.model.p.sample_rate, sr)
            wav = resample_poly(wav, self.model.p.sample_rate // g, sr // g)
        n = len(wav) - len(wav) % self.model.p.hop_length
        if n < self.model.p.n_fft:
            return None
        return float(self.model(jnp.asarray(wav[None, :n]))[0])
