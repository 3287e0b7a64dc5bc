"""Debug plotting helpers (ref ddsp_matcher.py:23-84, lib_ongaku_test.py:6-84
plot_multi_sequences / plot_matrix — plotly there, matplotlib here since
plotly isn't in this image). Debug-only; nothing on the conversion path
imports this module."""

from __future__ import annotations

import numpy as np


def plot_multi_sequences(x, ys, y_names, title: str = "", out_path: str | None = None,
                         x_axis: str = "", y_axis: str = ""):
    """Overlayed line plots. Saves to out_path (png/pdf) or shows."""
    import matplotlib

    matplotlib.use("Agg" if out_path else matplotlib.get_backend())
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 4))
    for y, name in zip(ys, y_names):
        ax.plot(np.asarray(x), np.asarray(y), label=name, linewidth=0.8)
    ax.set_title(title)
    ax.set_xlabel(x_axis)
    ax.set_ylabel(y_axis)
    ax.legend()
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
    plt.show()
    return fig


def plot_matrix(mat, row_names=None, col_names=None, title: str = "",
                out_path: str | None = None, x_axis: str = "", y_axis: str = ""):
    """Heatmap (e.g. selected-neighbor index matrices over time)."""
    import matplotlib

    matplotlib.use("Agg" if out_path else matplotlib.get_backend())
    import matplotlib.pyplot as plt

    mat = np.asarray(mat)
    fig, ax = plt.subplots(figsize=(12, 4))
    im = ax.imshow(mat, aspect="auto", cmap="coolwarm", interpolation="nearest")
    fig.colorbar(im, ax=ax)
    if col_names is not None:
        n = len(col_names)
        ticks = np.linspace(0, n - 1, min(n, 10)).astype(int)
        ax.set_xticks(ticks)
        ax.set_xticklabels([f"{col_names[t]:.2f}" if isinstance(col_names[t], float) else str(col_names[t]) for t in ticks])
    ax.set_title(title)
    ax.set_xlabel(x_axis)
    ax.set_ylabel(y_axis)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
    plt.show()
    return fig


def save_mel_figure(out_path, mel, title: str = "") -> str:
    """Log-mel heatmap PNG — the reference's tensorboard spectrogram figure
    (ref hifigan/ddsp_train.py:320-336, utils.plot_spectrogram) as a file."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 3))
    im = ax.imshow(np.asarray(mel), aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    ax.set_xlabel("frames")
    ax.set_ylabel("mel bins")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return str(out_path)
