"""Prosody losses (reference: nlp/prosody_prediction/criterion.py:16):
class-frequency-weighted CE on both heads with padding/ignore masking."""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import optax

__all__ = ["ProsodyCriterion"]

IGNORE = -1


class ProsodyCriterion:
    def __init__(self, binary_scale: float = 1.0, category_scale: float = 1.0,
                 class_weights: tp.Optional[jnp.ndarray] = None):
        self.binary_scale = binary_scale
        self.category_scale = category_scale
        self.class_weights = class_weights

    def __call__(self, outputs: dict, targets: dict, step) -> tp.Dict[str, jnp.ndarray]:
        losses = {}
        b_tgt = targets["binary"]
        mask = (b_tgt != IGNORE).astype(jnp.float32)
        ce_b = optax.softmax_cross_entropy_with_integer_labels(
            outputs["binary"], jnp.maximum(b_tgt, 0))
        losses["binary"] = self.binary_scale * jnp.sum(ce_b * mask) / jnp.maximum(mask.sum(), 1)

        c_tgt = targets["category"]
        cmask = (c_tgt != IGNORE).astype(jnp.float32)
        ce_c = optax.softmax_cross_entropy_with_integer_labels(
            outputs["category"], jnp.maximum(c_tgt, 0))
        if self.class_weights is not None:
            w = self.class_weights[jnp.maximum(c_tgt, 0)]
            ce_c = ce_c * w
        losses["category"] = self.category_scale * jnp.sum(ce_c * cmask) / jnp.maximum(cmask.sum(), 1)
        return losses


def eer(scores, labels) -> float:
    """Equal error rate (reference metric for the binary head)."""
    import numpy as np

    scores = np.asarray(scores).ravel()
    labels = np.asarray(labels).ravel()
    order = np.argsort(-scores)
    labels = labels[order]
    pos = labels.sum()
    neg = len(labels) - pos
    if pos == 0 or neg == 0:
        return 0.0
    tpr = np.cumsum(labels) / pos
    fpr = np.cumsum(1 - labels) / neg
    fnr = 1 - tpr
    i = np.argmin(np.abs(fnr - fpr))
    return float((fnr[i] + fpr[i]) / 2)
