"""Frechet Inception Distance from 2048-d features.

Math matches reference lib/metrics.py:284-319 (`_calculate_fid`):
||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)), sqrtm on the host via scipy
(covariances are 2048x2048 — a one-off host op, not a hot path).  Feature
extraction + gaussian stats run on device.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import linalg

import jax.numpy as jnp


def gaussian_stats(features) -> Tuple[np.ndarray, np.ndarray]:
    """features (N, D) -> (mu (D,), cov (D, D)) [sample covariance]."""
    feats = jnp.asarray(features, jnp.float64) \
        if jnp.asarray(features).dtype == jnp.float64 \
        else jnp.asarray(features, jnp.float32)
    mu = jnp.mean(feats, axis=0)
    centered = feats - mu
    cov = (centered.T @ centered) / (feats.shape[0] - 1)
    return np.asarray(mu, np.float64), np.asarray(cov, np.float64)


def fid_from_stats(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    cov1, cov2 = np.atleast_2d(cov1), np.atleast_2d(cov2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(cov1.dot(cov2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = linalg.sqrtm((cov1 + offset).dot(cov2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(cov1) + np.trace(cov2)
                 - 2 * np.trace(covmean))


def fid_from_features(feats1, feats2) -> float:
    mu1, c1 = gaussian_stats(feats1)
    mu2, c2 = gaussian_stats(feats2)
    return fid_from_stats(mu1, c1, mu2, c2)
