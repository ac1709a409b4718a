"""Vocoder inference SDK.

Capability parity with the reference VocoderEvaluationInterface
(tts/vocoders/eval_interface.py:181,220): load a GAN checkpoint, rebuild the
generator, ``synthesize(mel | TTSOutput) -> AudioChunk``; ``resynthesize``
runs waveform -> (on-device mel) -> waveform for copy-synthesis checks.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.io import AudioChunk
from speechflow_tpu.models.vocoder import Vocos, VocosParams
from speechflow_tpu.training import ExperimentSaver

__all__ = ["VocoderEvaluationInterface"]


# Module-level jitted entry points (weights are traced inputs, so the compile
# cache is shared across checkpoints of the same architecture — the GAN-grade
# probes load several).  Serving always runs under jit: besides latency, some
# backends only lower complex-valued ops (ISTFT heads) through XLA — eager
# op-by-op dispatch of `mag * exp(i*phase)` is unimplemented on tunneled TPU.
@nnx.jit
def _forward(model: Vocos, inputs):
    out = model(inputs)
    return out[0] if isinstance(out, tuple) else out


@nnx.jit
def _from_features(model: Vocos, feats, cond, f0, style):
    return model.from_features(feats, cond=cond, f0=f0, style=style)


class VocoderEvaluationInterface:
    def __init__(self, ckpt_path: tp.Union[str, Path],
                 fold_inference: bool = True):
        tree, payload = ExperimentSaver.load_checkpoint(ckpt_path)
        self.payload = payload
        params = VocosParams.create(payload["model_params"])
        self.params = params
        self.model = Vocos(params, rngs=nnx.Rngs(0))
        state = nnx.state(self.model, nnx.Not(nnx.RngState))
        model_tree = tree["model"]
        if "generator" in model_tree:  # GANTrainer checkpoint layout
            model_tree = model_tree["generator"]
        nnx.replace_by_pure_dict(state, model_tree)
        nnx.update(self.model, state)
        if fold_inference:
            # exact layout transform of the trained BigVGAN-class head
            # (models/vocoder/folded_head.py) — no-op for other heads
            self.model.fold_inference()

    @property
    def sample_rate(self) -> int:
        return self.params.sample_rate

    def synthesize(self, mel_or_output, speaker_emb: tp.Optional[np.ndarray] = None,
                   f0: tp.Optional[np.ndarray] = None) -> AudioChunk:
        mel = getattr(mel_or_output, "after_postnet_spectrogram", mel_or_output)
        if mel is None:
            mel = mel_or_output
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        cond = None if speaker_emb is None else jnp.asarray(speaker_emb)
        kwargs = {}
        if self.model.nsf_head:
            if f0 is None:
                # TTS output in hand: expand its token-level pitch prediction
                # through the length-regulator attention (StyleTTS2 wiring)
                vp = getattr(mel_or_output, "variance_predictions", None) or {}
                attn = getattr(mel_or_output, "attention", None)
                if vp.get("aggregate_pitch") is not None and attn is not None:
                    f0 = jnp.einsum("btn,bn->bt", jnp.asarray(attn),
                                    jnp.asarray(vp["aggregate_pitch"]))
            if f0 is not None and jnp.asarray(f0).ndim == 1:
                f0 = jnp.asarray(f0)[None]
            kwargs = {"f0": None if f0 is None else jnp.asarray(f0),
                      "style": cond}
        wav = np.asarray(_from_features(self.model, mel, cond,
                                        kwargs.get("f0"), kwargs.get("style")))
        wav = wav.reshape(-1) if wav.shape[0] == 1 else wav
        return AudioChunk(data=np.clip(wav, -1.0, 1.0), sr=self.sample_rate)

    def resynthesize(self, audio: AudioChunk) -> AudioChunk:
        wav_np = audio.load(sr=self.sample_rate).waveform
        wav = jnp.asarray(wav_np)[None]
        inputs = {"waveform": wav}
        if self.model.nsf_head:  # host-side F0 for the sine source
            from speechflow_tpu.data.processors import np_dsp

            f0 = np_dsp.yin_f0_np(wav_np, self.sample_rate,
                                  self.params.hop_length, 2048, 80.0, 880.0, 0.2)
            inputs["pitch"] = jnp.asarray(f0)[None]
        out = np.asarray(_forward(self.model, inputs))[0]
        return AudioChunk(data=np.clip(out, -1.0, 1.0), sr=self.sample_rate)
