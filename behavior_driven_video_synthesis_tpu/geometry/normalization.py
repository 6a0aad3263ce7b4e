"""Keypoint z-score normalization with degenerate-dimension dropping.

Reproduces the SRNN-lineage scheme the reference uses
(/root/reference/data/data_conversions_3d.py:178-239, 361-385): compute
mean/std over the full data matrix, drop dimensions with std < 1e-4
(``dim_to_ignore``), z-score the rest.  Stats are computed host-side in numpy
once (data prep); normalize/unnormalize are jittable for the device paths.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp


@dataclass(frozen=True)
class NormStats:
    mean: np.ndarray          # (D,)
    std: np.ndarray           # (D,) with ignored dims set to 1.0
    dim_to_use: np.ndarray    # indices with std >= 1e-4
    dim_to_ignore: np.ndarray # indices with std < 1e-4

    @property
    def full_dim(self) -> int:
        return int(self.mean.shape[0])


def normalization_stats(complete_data: np.ndarray, eps: float = 1e-4) -> NormStats:
    """Compute mean/std/dim_to_use from an (N, D) data matrix."""
    mean = np.mean(complete_data, axis=0)
    std = np.std(complete_data, axis=0)
    dim_to_ignore = np.where(std < eps)[0]
    dim_to_use = np.where(std >= eps)[0]
    std = std.copy()
    std[dim_to_ignore] = 1.0
    return NormStats(mean=mean.astype(np.float32), std=std.astype(np.float32),
                     dim_to_use=dim_to_use, dim_to_ignore=dim_to_ignore)


def normalize(data, stats: NormStats):
    """(..., D) full-dim data -> (..., d_use) z-scored, reduced data."""
    data = jnp.asarray(data)
    z = (data - stats.mean) / stats.std
    return z[..., jnp.asarray(stats.dim_to_use)]


def unnormalize(normed, stats: NormStats):
    """(..., d_use) -> (..., D): scatter back into full dims, un-z-score.

    Ignored dimensions are restored to their (constant) mean.  Matches the
    reference's `unNormalizeData` (data_conversions_3d.py:182-215) but
    batched/jittable.
    """
    normed = jnp.asarray(normed)
    out_shape = normed.shape[:-1] + (stats.full_dim,)
    full = jnp.zeros(out_shape, normed.dtype)
    full = full.at[..., jnp.asarray(stats.dim_to_use)].set(normed)
    return full * stats.std + stats.mean


def revert_output_format(poses, stats: NormStats):
    """Alias matching the reference API (data_conversions_3d.py:218-239)."""
    return unnormalize(poses, stats)
