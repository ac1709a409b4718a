"""Prosody prediction inference (reference: nlp/prosody_prediction eval
interface, consumed by TTSEvaluationInterface.predict_prosody_by_text):
word tokenization with a hash vocabulary, per-word contour class prediction.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.models.prosody.model import ProsodyModel, ProsodyParams
from speechflow_tpu.training import ExperimentSaver

__all__ = ["ProsodyPredictionInterface", "hash_tokenize"]


def hash_tokenize(words: tp.Sequence[str], vocab_size: int = 8000) -> np.ndarray:
    """Deterministic hash vocabulary (no external tokenizer dependency)."""
    import hashlib

    ids = []
    for w in words:
        h = int(hashlib.md5(w.lower().encode()).hexdigest()[:8], 16)
        ids.append(1 + h % (vocab_size - 1))  # 0 reserved for PAD
    return np.asarray(ids, np.int32)


class ProsodyPredictionInterface:
    def __init__(self, ckpt_path: tp.Union[str, Path]):
        tree, payload = ExperimentSaver.load_checkpoint(ckpt_path)
        params = ProsodyParams.create(payload["model_params"])
        self.params = params
        self.model = ProsodyModel(params, rngs=nnx.Rngs(0))
        state = nnx.state(self.model, nnx.Not(nnx.RngState))
        nnx.replace_by_pure_dict(state, tree["model"])
        nnx.update(self.model, state)
        # trained WordLM vocabulary (tokenizer: word_lm) travels in the payload
        self.vocab: tp.Optional[dict] = payload.get("word_lm_vocab")

    def _tokenize(self, words: tp.Sequence[str]) -> np.ndarray:
        if self.vocab is not None:
            return np.asarray([self.vocab.get(w.lower(), 0) for w in words], np.int32)
        return hash_tokenize(words, self.params.vocab_size)

    def predict(self, words: tp.Sequence[str]) -> tp.Dict[str, np.ndarray]:
        ids = self._tokenize(words)
        n = len(ids)
        pad = (-n) % 16
        batch = {
            "token_ids": jnp.asarray(np.pad(ids, (0, pad))[None]),
            "lengths": jnp.asarray([n], jnp.int32),
        }
        out = self.model(batch, training=False)
        return {
            "has_contour": np.asarray(jnp.argmax(out["binary"], -1))[0, :n],
            "category": np.asarray(jnp.argmax(out["category"], -1))[0, :n],
        }
