"""TensorBoard figure helpers.

Parity target: ``/root/reference/inference/utils/plots.py`` —
spectrogram and attention-map figures logged during validation.
"""
from __future__ import annotations

import numpy as np


def plot_spectrogram(spectrogram: np.ndarray):
    """(T, n_mels) or (n_mels, T) log-mel → matplotlib figure."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    spec = np.asarray(spectrogram)
    if spec.shape[0] > spec.shape[1]:
        spec = spec.T
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(spec, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("frames")
    ax.set_ylabel("mel bins")
    fig.tight_layout()
    return fig


def plot_attn(attn: np.ndarray, max_heads: int = 4):
    """(H, Tq, Tk) attention weights → grid figure."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    attn = np.asarray(attn)
    n = min(max_heads, attn.shape[0])
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    if n == 1:
        axes = [axes]
    for i in range(n):
        axes[i].imshow(attn[i], aspect="auto", origin="lower",
                       interpolation="none")
        axes[i].set_title(f"head {i}")
    fig.tight_layout()
    return fig
