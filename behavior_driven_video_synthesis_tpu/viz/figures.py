"""Paper-figure helpers (inference-time only).

Equivalents of the reference's lib/figures.py entry points:
  * nearest_neighbours   — NN retrieval in beta- and pose-space vs the train
                           set (ref :23)
  * enrollment figures   — via viz.make_enrollment_strip
  * sample_examples      — diverse-future grid from prior samples
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from .videos import make_enrollment_strip, make_img_grid  # noqa: F401


def nearest_neighbours(queries: np.ndarray, database: np.ndarray,
                       k: int = 5, metric: str = "l2"
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Batched NN retrieval: queries (Q, D) against database (N, D).

    Returns (indices (Q, k), distances (Q, k)).  Used for both
    behavior-space (beta) and pose-space retrieval figures."""
    q = np.asarray(queries, np.float32)
    db = np.asarray(database, np.float32)
    if metric == "cos":
        qn = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-8)
        dn = db / (np.linalg.norm(db, axis=1, keepdims=True) + 1e-8)
        dist = 1.0 - qn @ dn.T
    else:
        dist = (np.sum(q ** 2, 1, keepdims=True)
                - 2 * q @ db.T + np.sum(db ** 2, 1)[None])
    idx = np.argsort(dist, axis=1)[:, :k]
    return idx, np.take_along_axis(dist, idx, axis=1)


def sample_examples_grid(sample_videos: np.ndarray, n_frames: int = 6
                         ) -> np.ndarray:
    """(S, T, H, W, C) sample rollout videos -> stacked filmstrips showing
    the diversity of futures (ref sample_examples, figures.py:1388)."""
    strips = [make_enrollment_strip(v, n_frames=n_frames)
              for v in sample_videos]
    return np.concatenate(strips, axis=0)


def nearest_neighbour_figure(betas: np.ndarray, sequences: np.ndarray,
                             labels: np.ndarray, out_path: str,
                             n_queries: int = 4, k: int = 3,
                             n_frames: int = 5) -> str:
    """Beta-space NN retrieval figure (reference nearest_neighbours,
    lib/figures.py:23): for n query sequences, retrieve the k nearest
    training behaviors (self excluded) and write a grid PNG — each row is
    the query's 3D-skeleton filmstrip followed by its neighbours', with
    action labels burned in.  Returns the png path."""
    import os

    from .videos import create_video_3d, save_png, text_to_vid

    betas = np.asarray(betas, np.float32)
    seqs = np.asarray(sequences, np.float32)
    labels = np.asarray(labels).reshape(len(betas), -1)[:, 0]
    n_queries = min(n_queries, len(betas))
    idx, _ = nearest_neighbours(betas[:n_queries], betas, k=k + 1)

    def strip(i):
        world = seqs[i].reshape(seqs[i].shape[0], -1, 3)
        # render ONLY the frames the strip keeps (matplotlib 3D rendering
        # is the cost here; axis bounds come from the selected frames)
        sel = np.linspace(0, world.shape[0] - 1, n_frames).astype(int)
        frames = create_video_3d(world[sel])
        frames = text_to_vid(frames, f"a{int(labels[i])}", (5, 20))
        return make_enrollment_strip(frames, n_frames=n_frames)

    rows = []
    for q in range(n_queries):
        neighbours = [i for i in idx[q] if i != q][:k]
        rows.append(np.concatenate([strip(q)]
                                   + [strip(i) for i in neighbours],
                                   axis=1))
    grid = np.concatenate(rows, axis=0)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    save_png(grid.astype(np.uint8), out_path)
    return out_path
