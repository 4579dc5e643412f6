"""Spectrum and accuracy plots (reference: `hippyflow/utilities/plotting.py`).

matplotlib is optional; every entry point degrades to a no-op when it is
missing or a non-interactive backend fails.
"""

from __future__ import annotations

import numpy as np


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def spectrum_plot(d, axis_label=("i", "lambda_i", "spectrum"), out_name=None, show=False):
    """Semilog eigenvalue decay plot (`plotting.py:18-60`)."""
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots()
    d = np.asarray(d)
    ax.semilogy(np.arange(1, len(d) + 1), np.maximum(d, 1e-300), "o-")
    ax.set_xlabel(axis_label[0])
    ax.set_ylabel(axis_label[1])
    ax.set_title(axis_label[2])
    if out_name:
        fig.savefig(out_name, bbox_inches="tight")
    plt.close(fig)
    return fig


def generic_semilogy_plot(xs, ys, labels=None, axis_label=("x", "y", ""), out_name=None):
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots()
    for i, y in enumerate(np.atleast_2d(ys)):
        lbl = labels[i] if labels else None
        ax.semilogy(xs, y, "o-", label=lbl)
    ax.set_xlabel(axis_label[0])
    ax.set_ylabel(axis_label[1])
    ax.set_title(axis_label[2])
    if labels:
        ax.legend()
    if out_name:
        fig.savefig(out_name, bbox_inches="tight")
    plt.close(fig)
    return fig


def plot_accs_vs_data(data_sizes, accs, labels=None, out_name=None):
    """Accuracy-vs-training-data-count curves (`plotting.py:83-132`)."""
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots()
    accs = np.atleast_2d(np.asarray(accs))
    for i, a in enumerate(accs):
        lbl = labels[i] if labels else None
        ax.semilogx(data_sizes, a, "o-", label=lbl)
    ax.set_xlabel("training data")
    ax.set_ylabel("accuracy")
    if labels:
        ax.legend()
    if out_name:
        fig.savefig(out_name, bbox_inches="tight")
    plt.close(fig)
    return fig


def plot_eigenvector(space, vec, out_name=None):
    """Triplot render of a P1 field (`plot_eigenvectors.py:28-162`)."""
    plt = _plt()
    if plt is None:
        return None
    import matplotlib.tri as mtri

    mesh = space.mesh
    tri = mtri.Triangulation(
        mesh.vertices[:, 0], mesh.vertices[:, 1], mesh.cells
    )
    fig, ax = plt.subplots()
    tc = ax.tripcolor(tri, np.asarray(vec), shading="gouraud")
    fig.colorbar(tc)
    ax.set_aspect("equal")
    if out_name:
        fig.savefig(out_name, bbox_inches="tight")
    plt.close(fig)
    return fig
