"""Structural similarity (Wang et al.), batched JAX.

Matches the skimage configuration the reference uses
(/root/reference/lib/metrics.py:95-107): gaussian_weights=True (sigma=1.5,
truncate=3.5 -> 11x11 window), use_sample_covariance=False, data_range=1.0,
multichannel (per-channel SSIM averaged).  Runs the whole batch as one
device program — the reference calls skimage per image on the host.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _gaussian_kernel(sigma: float = 1.5, truncate: float = 3.5):
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _filter2d_sep(img, kernel):
    """Separable 'valid' gaussian filter over H, W of NHWC via depthwise
    convs."""
    C = img.shape[-1]
    kh = jnp.asarray(kernel).reshape(-1, 1, 1, 1)
    kw = jnp.asarray(kernel).reshape(1, -1, 1, 1)
    dn = jax.lax.conv_dimension_numbers(img.shape, (kh.shape[0], 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        img, jnp.tile(kh, (1, 1, 1, C)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=C)
    out = jax.lax.conv_general_dilated(
        out, jnp.tile(kw, (1, 1, 1, C)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=C)
    return out


def ssim(img1, img2, data_range: float = 1.0, sigma: float = 1.5,
         truncate: float = 3.5, k1: float = 0.01, k2: float = 0.03):
    """img1/img2: (B, H, W, C) in [0, data_range] -> (B,) mean SSIM.

    Population (uniform-normalized gaussian) covariance, matching
    use_sample_covariance=False.
    """
    kernel = _gaussian_kernel(sigma, truncate)
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    mu1 = _filter2d_sep(img1, kernel)
    mu2 = _filter2d_sep(img2, kernel)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d_sep(img1 * img1, kernel) - mu1_sq
    sigma2_sq = _filter2d_sep(img2 * img2, kernel) - mu2_sq
    sigma12 = _filter2d_sep(img1 * img2, kernel) - mu12

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu12 + c1) * (2 * sigma12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    ssim_map = num / den
    return jnp.mean(ssim_map, axis=(1, 2, 3))
