"""Sampling distributions and parallel host-side preprocessing.

Ports of /root/reference/lib/utils.py:753-772 (`get_area_sampling_dist` —
oversample 'hard' poses with small convex-hull area) and :775-867
(`parallel_data_prefetch` — fork-based map over chunks; here a thread pool,
since the heavy work is numpy/scipy which releases the GIL), plus the
inverse-person-frequency distribution the cvbae experiment uses
(shape_and_pose_net.py:114-155 'pid' sampling).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional, Sequence

import numpy as np
from scipy.spatial import ConvexHull


def get_area_sampling_dist(kps: np.ndarray, exp_weight: float = 1.0,
                           kp_subset: Optional[Sequence[int]] = None
                           ) -> np.ndarray:
    """(N, K, 2+) keypoints -> unnormalized weights 1/hull_area^w."""
    out = np.empty(len(kps), np.float64)
    sub = None if kp_subset is None else np.asarray(kp_subset)
    for i, kp in enumerate(kps):
        pts = kp[:, :2] if sub is None else kp[sub, :2]
        try:
            area = ConvexHull(pts).area
        except Exception:
            area = 1.0  # degenerate pose
        out[i] = (1.0 / max(area, 1e-8)) ** exp_weight
    return out


def get_pid_sampling_dist(p_ids: np.ndarray) -> np.ndarray:
    """Inverse person-frequency weights (cvbae 'pid' sampling)."""
    uniq, counts = np.unique(p_ids, return_counts=True)
    freq = dict(zip(uniq.tolist(), counts.tolist()))
    w = np.asarray([1.0 / freq[int(p)] for p in p_ids], np.float64)
    return w / w.sum()


def parallel_data_prefetch(func: Callable, data: Sequence,
                           n_proc: int = 8) -> list:
    """Map ``func`` over chunks of ``data`` in parallel, concatenating
    results in order (reference lib/utils.py:775-867)."""
    n_proc = max(1, min(n_proc, len(data)))
    chunks = np.array_split(np.arange(len(data)), n_proc)

    def run(chunk_ids):
        return [func(data[i]) for i in chunk_ids]

    with ThreadPoolExecutor(n_proc) as pool:
        results = list(pool.map(run, chunks))
    out = []
    for r in results:
        out.extend(r)
    return out
