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
