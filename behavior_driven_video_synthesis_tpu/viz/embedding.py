"""Latent-embedding scatter plots + error histograms.

Equivalents of the reference's `log_umap` (lib/logging.py:1366-1436) and
`make_hist` (:1347-1363).  The umap package is not in this image, so the
projector falls back to a PCA scatter (same artifact shape: a 2D embedding
colored by label).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def embed_2d(latents: np.ndarray, method: str = "auto") -> np.ndarray:
    """(N, D) -> (N, 2) embedding; UMAP when available, else PCA."""
    latents = np.asarray(latents, np.float64)
    if method in ("auto", "umap"):
        try:
            import umap  # type: ignore

            return umap.UMAP(n_components=2).fit_transform(latents)
        except ImportError:
            if method == "umap":
                raise
    centered = latents - latents.mean(0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    return centered @ vt[:2].T


def plot_embedding(latents: np.ndarray, labels: Optional[np.ndarray] = None,
                   out_path: Optional[str] = None) -> np.ndarray:
    """Scatter the 2D embedding colored by label; returns the rendered
    RGB image (and writes a png when out_path given)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    emb = embed_2d(latents)
    fig, ax = plt.subplots(figsize=(5, 5))
    sc = ax.scatter(emb[:, 0], emb[:, 1],
                    c=None if labels is None else np.asarray(labels),
                    cmap="tab10", s=6)
    if labels is not None:
        fig.colorbar(sc, ax=ax)
    ax.set_title("behavior-latent embedding")
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    if out_path:
        fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return img


def make_hist(values: np.ndarray, out_path: Optional[str] = None,
              bins: int = 50, title: str = "per-sequence recon error"
              ) -> np.ndarray:
    """Histogram image of per-sequence reconstruction errors."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 3))
    ax.hist(np.asarray(values).ravel(), bins=bins)
    ax.set_title(title)
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    if out_path:
        fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return img
