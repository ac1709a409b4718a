"""Trainable CREPE-class pitch tracker (tiny conv net over waveform frames).

The reference PitchProcessor offers pyworld-dio, torchcrepe, and Yingram as
pitch methods (spectrogram_processors.py:693-699); torchcrepe downloads
pretrained weights, which are unreachable offline.  The framework's third F0
method is therefore a *trainable* CREPE-class tracker in the same zero-egress
pattern as the CPC features and the G2P: a small conv net classifying each
analysis frame into log-spaced pitch bins, trained entirely on synthetic
harmonic signals with known f0 (random harmonic envelopes + noise + unvoiced
negatives), so any experiment can mint its own tracker on device.

Architecture (CREPE, Kim et al. 2018, scaled down):
  frame (N, W) -> per-frame normalize -> [Conv1D + maxpool] x 4 -> dense
  -> per-bin sigmoid over ``n_bins`` log-spaced pitch classes.
Decoding is CREPE's local weighted average of bin activations around the
argmax (sub-bin resolution), with voicing = peak confidence > threshold and
f0 == 0 on unvoiced frames — the same output contract as ops.pitch.yin_f0.

Everything is static-shape and batched: one jitted forward per utterance
batch; frames go through the MXU as a (N, W) x (W, C) stack, not a Python
loop.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.training.base_model import BaseModelParams

__all__ = ["CrepeParams", "CrepeF0", "crepe_f0", "train_crepe",
           "synth_pitch_batch"]


class CrepeParams(BaseModelParams):
    sample_rate: int = 24000
    frame_length: int = 1024
    n_bins: int = 128
    f0_min: float = 50.0
    f0_max: float = 1100.0
    channels: tp.Tuple[int, ...] = (32, 32, 64, 64)
    kernel_sizes: tp.Tuple[int, ...] = (64, 16, 16, 16)
    strides: tp.Tuple[int, ...] = (4, 1, 1, 1)
    dense_dim: int = 128


def _bin_cents(p: CrepeParams) -> np.ndarray:
    """Bin centers on the cents scale (1200*log2(f/10 Hz)), log-spaced
    between f0_min and f0_max."""
    lo = 1200.0 * np.log2(p.f0_min / 10.0)
    hi = 1200.0 * np.log2(p.f0_max / 10.0)
    return np.linspace(lo, hi, p.n_bins).astype(np.float32)


class CrepeF0(nnx.Module):
    def __init__(self, params: CrepeParams, rngs: tp.Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        p = params
        self.p = p
        ch_in = 1
        self.convs = nnx.List([])
        self.norms = nnx.List([])
        for ch, k, s in zip(p.channels, p.kernel_sizes, p.strides):
            self.convs.append(nnx.Conv(ch_in, ch, (k,), strides=(s,),
                                       padding="SAME", rngs=rngs))
            self.norms.append(nnx.LayerNorm(ch, rngs=rngs))
            ch_in = ch
        # output length after strides + a maxpool(2) per layer
        t = p.frame_length
        for s in p.strides:
            t = -(-t // s)   # ceil for SAME conv
            t = t // 2       # maxpool
        self.dense = nnx.Linear(t * ch_in, p.dense_dim, rngs=rngs)
        self.out = nnx.Linear(p.dense_dim, p.n_bins, rngs=rngs)
        self.cents = nnx.Variable(jnp.asarray(_bin_cents(p)))

    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        """(N, W) frames -> (N, n_bins) logits."""
        x = frames - frames.mean(-1, keepdims=True)
        x = x / (jnp.sqrt((x ** 2).mean(-1, keepdims=True)) + 1e-5)
        x = x[..., None]
        for conv, norm in zip(self.convs, self.norms):
            x = norm(nnx.relu(conv(x)))
            n = x.shape[-2] - x.shape[-2] % 2
            x = jnp.maximum(x[..., 0:n:2, :], x[..., 1:n:2, :])  # maxpool(2)
        x = x.reshape(x.shape[0], -1)
        x = nnx.relu(self.dense(x))
        return self.out(x)

    def decode(self, logits: jnp.ndarray, threshold: float = 0.5,
               window: int = 4) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
        """(N, n_bins) logits -> (f0 Hz with 0 where unvoiced, confidence).

        CREPE decode: weighted average of activations in a ±``window`` bin
        neighborhood of the argmax, on the cents scale."""
        p = jax.nn.sigmoid(logits)
        conf = p.max(-1)
        center = p.argmax(-1)
        n_bins = logits.shape[-1]
        offs = jnp.arange(-window, window + 1)
        idx = jnp.clip(center[:, None] + offs[None, :], 0, n_bins - 1)
        w = jnp.take_along_axis(p, idx, axis=-1)
        c = jnp.take(self.cents[...], idx)
        cents = (w * c).sum(-1) / (w.sum(-1) + 1e-9)
        f0 = 10.0 * 2.0 ** (cents / 1200.0)
        return jnp.where(conf > threshold, f0, 0.0), conf


def crepe_f0(model: CrepeF0, x: jnp.ndarray, sr: tp.Optional[int] = None,
             hop_length: int = 256, threshold: float = 0.5) -> jnp.ndarray:
    """(B, T) or (T,) waveform -> (B, n_frames) f0 in Hz (0 on unvoiced).

    Framing matches ops.pitch.yin_f0 (centered, ``1 + T // hop`` frames) so
    the three methods are drop-in interchangeable in the pitch handler.
    ``sr`` must equal the training sample rate when given (no resampling
    here — the data pipeline resamples upstream)."""
    from speechflow_tpu.ops.stft import frame_signal

    p = model.p
    if sr is not None and int(sr) != int(p.sample_rate):
        raise ValueError(f"crepe tracker trained at {p.sample_rate} Hz, "
                         f"got audio at {sr} Hz")
    if x.ndim == 1:
        x = x[None]
    t = x.shape[-1]
    n_frames = 1 + t // hop_length
    half = p.frame_length // 2
    xp = jnp.pad(x, ((0, 0), (half, half + p.frame_length)))
    frames = frame_signal(xp, p.frame_length, hop_length)[:, :n_frames]
    b = frames.shape[0]
    logits = model(frames.reshape(b * n_frames, p.frame_length))
    f0, _ = model.decode(logits, threshold=threshold)
    return f0.reshape(b, n_frames)


# --------------------------------------------------------------------------- #
#  synthetic training data                                                    #
# --------------------------------------------------------------------------- #


def synth_pitch_batch(rng: np.random.Generator, p: CrepeParams, batch: int,
                      voiced_frac: float = 0.85,
                      f0_range: tp.Tuple[float, float] = (60.0, 600.0),
                      label_sigma_bins: float = 1.5):
    """(frames (B, W), targets (B, n_bins)) of random harmonic signals.

    Voiced items: f0 with small intra-frame drift and jitter, harmonics with
    random spectral decay and per-harmonic amplitude jitter, random phase,
    additive noise at 5-40 dB SNR.  Unvoiced items: shaped noise, target all
    zeros.  Targets are Gaussian-blurred one-hots on the bin (cents) scale —
    CREPE's training target."""
    w = p.frame_length
    sr = p.sample_rate
    n = np.arange(w)
    frames = np.zeros((batch, w), np.float32)
    targets = np.zeros((batch, p.n_bins), np.float32)
    cents_grid = _bin_cents(p)
    for i in range(batch):
        if rng.uniform() < voiced_frac:
            f0 = np.exp(rng.uniform(np.log(f0_range[0]), np.log(f0_range[1])))
            # slow intra-frame drift up to ±2%
            drift = f0 * rng.uniform(-0.02, 0.02)
            f_inst = f0 + drift * (n / w - 0.5)
            phase = 2 * np.pi * np.cumsum(f_inst) / sr + rng.uniform(0, 2 * np.pi)
            n_harm = max(1, min(int(sr / 2 / f0) - 1, 24))
            gamma = rng.uniform(0.7, 2.5)
            sig = np.zeros(w)
            for k in range(1, n_harm + 1):
                a = k ** -gamma * rng.uniform(0.5, 1.5)
                sig += a * np.sin(k * phase + rng.uniform(0, 2 * np.pi))
            sig /= max(np.abs(sig).max(), 1e-6)
            snr_db = rng.uniform(5.0, 40.0)
            noise = rng.standard_normal(w)
            noise *= np.sqrt((sig ** 2).mean()) / (
                np.sqrt((noise ** 2).mean()) + 1e-9) * 10 ** (-snr_db / 20)
            frames[i] = (sig + noise) * rng.uniform(0.05, 1.0)
            cents = 1200.0 * np.log2(f0 / 10.0)
            d = (cents_grid - cents) / (label_sigma_bins *
                                        (cents_grid[1] - cents_grid[0]))
            targets[i] = np.exp(-0.5 * d ** 2)
        else:
            # shaped noise: random one-pole lowpass of white noise
            a = rng.uniform(0.0, 0.95)
            e = rng.standard_normal(w)
            sig = np.zeros(w)
            acc = 0.0
            # vectorized one-pole via FFT would be nicer; lfilter-free loop
            # is fine at W=1024
            for j in range(w):
                acc = a * acc + (1 - a) * e[j]
                sig[j] = acc
            frames[i] = sig / max(np.abs(sig).max(), 1e-6) * rng.uniform(0.05, 1.0)
    return frames, targets


def train_crepe(params: tp.Optional[CrepeParams] = None, steps: int = 600,
                batch: int = 64, lr: float = 1e-3, seed: int = 0) -> CrepeF0:
    """Train a tracker on synthetic frames; returns the trained module.

    Loss is per-bin binary cross-entropy against the blurred targets (CREPE's
    objective).  ~600 steps x 64 frames reaches <1% median relative f0 error
    on held synthetic tones (tests/test_pitch_crepe.py pins the tolerance)."""
    import optax

    p = params or CrepeParams()
    model = CrepeF0(p, rngs=nnx.Rngs(seed))
    opt = nnx.Optimizer(model, optax.adamw(lr), wrt=nnx.Param)
    rng = np.random.default_rng(seed)

    @nnx.jit
    def step(model, opt, frames, targets):
        def loss_fn(m):
            logits = m(frames)
            bce = optax.sigmoid_binary_cross_entropy(logits, targets)
            return bce.mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    for _ in range(steps):
        frames, targets = synth_pitch_batch(rng, p, batch)
        step(model, opt, jnp.asarray(frames), jnp.asarray(targets))
    return model


def save_crepe(model: CrepeF0, path) -> None:
    from speechflow_tpu.utils.state_io import save_module

    save_module(model, model.p, path)


def load_crepe(path) -> CrepeF0:
    from speechflow_tpu.utils.state_io import load_module

    model, _ = load_module(CrepeF0, CrepeParams, path)
    return model
