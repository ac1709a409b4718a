"""Plot helpers (reference: speechflow/utils/plotting.py): spectrogram and
1D-signal figures rendered to arrays for TensorBoard image logging."""

from __future__ import annotations

import typing as tp

import numpy as np

__all__ = ["plot_spectrogram", "plot_1d_overlay", "figure_to_array"]


def figure_to_array(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    import matplotlib.pyplot as plt

    plt.close(fig)
    return buf


def plot_spectrogram(spec: np.ndarray, title: str = "") -> np.ndarray:
    """(T, F) -> (H, W, 3) image array."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 3), dpi=80)
    im = ax.imshow(spec.T, aspect="auto", origin="lower", interpolation="none")
    if title:
        ax.set_title(title)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    return figure_to_array(fig)


def plot_1d_overlay(signals: tp.Dict[str, np.ndarray], title: str = "") -> np.ndarray:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 2.5), dpi=80)
    for name, sig in signals.items():
        ax.plot(np.asarray(sig), label=name, lw=1)
    ax.legend(fontsize="small")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    return figure_to_array(fig)
