"""Spectral-bias denoiser for vocoder outputs.

Capability parity with the reference Denoiser (tts/vocoders/denoiser.py,
WaveGlow-style): synthesize the vocoder's "bias" audio from a zero/silence
feature input, take its magnitude spectrum as the noise profile, and
spectrally subtract (with strength) from generated audio, resynthesizing via
ISTFT with the original phase.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np

from speechflow_tpu import ops

__all__ = ["Denoiser"]


class Denoiser:
    def __init__(self, vocoder, n_mels: int = 100, n_fft: int = 1024,
                 hop_length: int = 256, mode: str = "zeros",
                 bias_frames: int = 88):
        """``vocoder``: a Vocos-like module with from_features()."""
        self.n_fft = n_fft
        self.hop = hop_length
        if mode == "zeros":
            feats = jnp.zeros((1, bias_frames, n_mels))
        else:  # "normal" mel floor (log(1e-5) everywhere)
            feats = jnp.full((1, bias_frames, n_mels), float(np.log(1e-5)))
        bias_audio = vocoder.from_features(feats)
        spec = ops.stft(bias_audio, n_fft, hop_length)
        self.bias_spec = jnp.abs(spec).mean(axis=1, keepdims=True)  # (1, 1, F)

    def __call__(self, audio: jnp.ndarray, strength: float = 0.05) -> jnp.ndarray:
        if audio.ndim == 1:
            audio = audio[None]
            squeeze = True
        else:
            squeeze = False
        spec = ops.stft(audio, self.n_fft, self.hop)
        mag = jnp.abs(spec)
        phase = jnp.angle(spec)
        mag = jnp.maximum(mag - strength * self.bias_spec, 0.0)
        clean = ops.istft(mag * jnp.exp(1j * phase), self.n_fft, self.hop,
                          length=audio.shape[-1])
        return clean[0] if squeeze else clean
