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


def plot_singular_values_with_std(
    s_mean, s_std, axis_label=("i", "sigma_i", ""), out_name=None
):
    """Mean singular-value decay with a +/- std band
    (`plotting.py:135-159`)."""
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots()
    s_mean = np.asarray(s_mean)
    s_std = np.asarray(s_std)
    idx = np.arange(1, len(s_mean) + 1)
    ax.semilogy(idx, np.maximum(s_mean, 1e-300), "o-")
    ax.fill_between(
        idx,
        np.maximum(s_mean - s_std, 1e-300),
        s_mean + s_std,
        alpha=0.3,
    )
    ax.set_xlabel(axis_label[0])
    ax.set_ylabel(axis_label[1])
    ax.set_title(axis_label[2])
    if out_name:
        fig.savefig(out_name, bbox_inches="tight")
    plt.close(fig)
    return fig


def subspace_angle_video(bases, out_name="subspace_angles.mp4", fps=2):
    """Principal-angle evolution between successive bases
    (`plotting.py:162-204`).  Saves an mp4 when ffmpeg is available,
    otherwise a per-frame png series next to ``out_name``."""
    plt = _plt()
    if plt is None or len(bases) < 2:
        return None
    import os

    def angles(U, V):
        s = np.linalg.svd(np.asarray(U).T @ np.asarray(V), compute_uv=False)
        return np.degrees(np.arccos(np.clip(s, -1.0, 1.0)))

    frames = [angles(bases[i], bases[i + 1]) for i in range(len(bases) - 1)]
    fig, ax = plt.subplots()

    try:
        import matplotlib.animation as manim

        writer = manim.FFMpegWriter(fps=fps)
        with writer.saving(fig, out_name, dpi=100):
            for i, f in enumerate(frames):
                ax.clear()
                ax.plot(f, "o-")
                ax.set_ylim(0, 90)
                ax.set_xlabel("mode")
                ax.set_ylabel("principal angle (deg)")
                ax.set_title(f"frame {i}")
                writer.grab_frame()
        plt.close(fig)
        return out_name
    except Exception:
        base, _ = os.path.splitext(out_name)
        for i, f in enumerate(frames):
            ax.clear()
            ax.plot(f, "o-")
            ax.set_ylim(0, 90)
            ax.set_xlabel("mode")
            ax.set_ylabel("principal angle (deg)")
            fig.savefig(f"{base}_{i:04d}.png", bbox_inches="tight")
        plt.close(fig)
        return base


def plot(space, vec, out_name=None, **kwargs):
    """2D FE field triplot (`plot_eigenvectors.py:28-80` `plot`)."""
    return plot_eigenvector(space, vec, out_name=out_name)


def plot_pts(points, values=None, out_name=None):
    """Scatter of observation targets (`plot_eigenvectors.py` `plot_pts`)."""
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots()
    points = np.asarray(points)
    sc = ax.scatter(
        points[:, 0], points[:, 1],
        c=None if values is None else np.asarray(values),
    )
    if values is not None:
        fig.colorbar(sc)
    ax.set_aspect("equal")
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
