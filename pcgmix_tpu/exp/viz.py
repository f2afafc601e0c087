"""Signal/spectrogram/saliency debug visualization (utils.py:86-165).

File-writing (Agg) equivalents of the reference's inline notebook helpers:
segment boundaries as dashed verticals, optional cut markers and saliency
heat overlay.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def show_sig(signal, frames=(), cuts=(), sal=None, path="signal.png",
             ylim=(-8, 8)) -> str:
    """Plot up to 4 channels of a (C, T) signal with segment boundaries
    (utils.py:108-165)."""
    signal = np.asarray(signal)
    if signal.ndim == 1:
        signal = signal[None, :]
    n_ch = min(signal.shape[0], 4)
    fig, axs = plt.subplots(n_ch, 1, figsize=(20, 1.2 * n_ch), sharex=True,
                            squeeze=False)
    for ch in range(n_ch):
        ax = axs[ch, 0]
        ax.plot(signal[ch], color="k", linewidth=0.6)
        if sal is not None:
            ax.imshow(
                np.atleast_2d(np.asarray(sal)),
                extent=(0, signal.shape[-1], ylim[0], ylim[1]),
                cmap="jet", vmin=0, vmax=1, alpha=0.5, aspect="auto",
            )
        for f in frames:
            ax.axvline(x=f, linestyle="--", color="k", linewidth=0.6)
        for c in cuts:
            ax.axvline(x=c, color="red", linewidth=0.8)
        ax.set_ylim(*ylim)
    plt.subplots_adjust(hspace=0.0)
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def show_spectrogram(spec, frames=(), path="spectrogram.png") -> str:
    """Plot a (F, T) spectrogram with segment boundaries (utils.py:86-96)."""
    spec = np.asarray(spec)
    fig = plt.figure(figsize=(8, 3))
    plt.imshow(spec, origin="lower", aspect="auto")
    for f in list(frames)[:4]:
        plt.axvline(x=f, color="k")
    plt.xlim(0, spec.shape[-1] - 1)
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def show_sal(saliency, path="saliency.png") -> str:
    """Saliency heatmap (utils.py:99-105)."""
    fig = plt.figure(figsize=(5, 2))
    plt.imshow(np.atleast_2d(np.asarray(saliency)), cmap="jet", aspect="auto")
    plt.colorbar()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path
