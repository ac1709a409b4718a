"""Acoustic-model IO dataclasses.

Capability parity with the reference component IO types
(tts/acoustic_models/modules/data_types.py:33,179-209 and
tts/acoustic_models/data_types.py TTSForwardInput/TTSTarget): a
``ComponentInput`` carrying content streams + lengths + global embeddings +
accumulated additional content/losses, flowing Embedding -> Encoder ->
VarianceAdaptor -> Decoder -> Postnet; ``TTSForwardInput``/``TTSTarget`` are
the batch-processor outputs shared by the acoustic model AND the vocoder
(SURVEY §A.4 contract). All pytree-registered dataclasses of jnp arrays.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

__all__ = ["TTSForwardInput", "TTSTarget", "ComponentState", "TTSOutput"]


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return [getattr(obj, n) for n in fields], None

    def unflatten(aux, children):
        return cls(**dict(zip(fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class TTSForwardInput:
    transcription: tp.Optional[jnp.ndarray] = None        # (B, N) int32
    transcription_lengths: tp.Optional[jnp.ndarray] = None
    speaker_id: tp.Optional[jnp.ndarray] = None            # (B,)
    lang_id: tp.Optional[jnp.ndarray] = None
    speaker_emb: tp.Optional[jnp.ndarray] = None            # (B, D)
    durations: tp.Optional[jnp.ndarray] = None              # (B, N) teacher durations
    aggregate_pitch: tp.Optional[jnp.ndarray] = None        # (B, N)
    aggregate_energy: tp.Optional[jnp.ndarray] = None
    ling_feat: tp.Optional[jnp.ndarray] = None              # (B, N, F)
    lm_feat: tp.Optional[jnp.ndarray] = None
    xpbert_feat: tp.Optional[jnp.ndarray] = None        # (B, N, D) phoneme-level LM
    prosody: tp.Optional[jnp.ndarray] = None                # (B, N) int
    mel: tp.Optional[jnp.ndarray] = None                    # (B, T, n_mels) reference/target
    mel_lengths: tp.Optional[jnp.ndarray] = None
    pitch: tp.Optional[jnp.ndarray] = None                  # (B, T) frame-level
    energy: tp.Optional[jnp.ndarray] = None
    ranges: tp.Optional[jnp.ndarray] = None                 # (B, n_feat, 4) speaker stat ranges
    speech_quality_emb: tp.Optional[jnp.ndarray] = None      # (B, 5) NISQA-style dims
    ssl_feat: tp.Optional[jnp.ndarray] = None                # (B, T', D) SSL features
    pitch_modifier: tp.Optional[jnp.ndarray] = None          # (B, N) SSML factors
    volume_modifier: tp.Optional[jnp.ndarray] = None
    rate_modifier: tp.Optional[jnp.ndarray] = None
    averages: tp.Optional[tp.Dict[str, jnp.ndarray]] = None  # name -> (B,) utterance scalars
    pad_id: int = 0

    def get(self, name, default=None):
        return getattr(self, name, default)


@_pytree_dataclass
class TTSTarget:
    mel: tp.Optional[jnp.ndarray] = None
    mel_lengths: tp.Optional[jnp.ndarray] = None
    gate: tp.Optional[jnp.ndarray] = None
    durations: tp.Optional[jnp.ndarray] = None
    aggregate_pitch: tp.Optional[jnp.ndarray] = None
    aggregate_energy: tp.Optional[jnp.ndarray] = None
    transcription_lengths: tp.Optional[jnp.ndarray] = None
    speaker_id: tp.Optional[jnp.ndarray] = None


@_pytree_dataclass
class ComponentState:
    """The stream flowing through model stages."""

    content: tp.Optional[jnp.ndarray] = None            # (B, L, D)
    lengths: tp.Optional[jnp.ndarray] = None             # (B,)
    embeddings: tp.Optional[tp.Dict[str, jnp.ndarray]] = None  # global (B, D) conditions
    additional_content: tp.Optional[tp.Dict[str, jnp.ndarray]] = None
    additional_losses: tp.Optional[tp.Dict[str, jnp.ndarray]] = None

    def embedding(self, name: str):
        return (self.embeddings or {}).get(name)

    def with_(self, **kwargs) -> "ComponentState":
        return dataclasses.replace(self, **kwargs)

    def add_content(self, name: str, value) -> "ComponentState":
        ac = dict(self.additional_content or {})
        ac[name] = value
        return self.with_(additional_content=ac)

    def add_loss(self, name: str, value) -> "ComponentState":
        al = dict(self.additional_losses or {})
        al[name] = value
        return self.with_(additional_losses=al)


@_pytree_dataclass
class TTSOutput:
    spectrogram: tp.Optional[jnp.ndarray] = None          # (S, B, T, n_mels) stacked stages
    spectrogram_lengths: tp.Optional[jnp.ndarray] = None
    gate: tp.Optional[jnp.ndarray] = None                  # (B, T) logits
    variance_predictions: tp.Optional[tp.Dict[str, jnp.ndarray]] = None
    attention: tp.Optional[jnp.ndarray] = None             # (B, T, N) length-regulator attn
    additional_content: tp.Optional[tp.Dict[str, jnp.ndarray]] = None
    additional_losses: tp.Optional[tp.Dict[str, jnp.ndarray]] = None

    @property
    def after_postnet_spectrogram(self):
        return None if self.spectrogram is None else self.spectrogram[-1]
