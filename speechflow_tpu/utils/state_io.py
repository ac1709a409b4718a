"""Lightweight single-module checkpoints.

The ExperimentSaver (training/saver.py) owns full experiment checkpoints
(orbax, configs, singletons). For small auxiliary models that back data-plane
feature handlers — the ECAPA speaker embedder, the RVQ neural codec — a
one-file pickle of (params dict, pure state dict) is enough and keeps the
handlers dependency-free. Counterpart of the reference's practice of loading
pickled/pt auxiliary models inside processors (biometric_processors.py:33,
audio_processors.py:378).
"""

from __future__ import annotations

import pickle
import typing as tp
from pathlib import Path

import numpy as np


def save_module(model, params, path: tp.Union[str, Path]) -> Path:
    """Persist an nnx module + its BaseModelParams to one pickle file."""
    import jax
    from flax import nnx

    state = nnx.to_pure_dict(nnx.state(model, nnx.Not(nnx.RngState)))
    state = jax.tree_util.tree_map(np.asarray, state)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"params": params.to_dict(), "state": state}, f)
    return path


def load_module(model_cls, params_cls, path: tp.Union[str, Path], rngs=None):
    """Rebuild a module saved by :func:`save_module`. Returns (model, params)."""
    from flax import nnx

    with open(path, "rb") as f:
        tree = pickle.load(f)
    params = params_cls.create(tree["params"])
    model = model_cls(params, rngs=rngs or nnx.Rngs(0))
    state = nnx.state(model, nnx.Not(nnx.RngState))
    nnx.replace_by_pure_dict(state, tree["state"])
    nnx.update(model, state)
    return model, params
