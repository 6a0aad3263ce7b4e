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
    # HIGHEST precision is required on TPU: the default conv precision
    # routes f32 through bf16 MXU passes, and the E[x^2]-mu^2 variance
    # below then suffers bf16-scale cancellation (~4e-3 relative) that
    # dwarfs c2=(0.03*range)^2=9e-4 — observed as SSIM "2.24" on chip.
    # These are 11-tap depthwise filters; the precision cost is nil.
    out = jax.lax.conv_general_dilated(
        img, jnp.tile(kh, (1, 1, 1, C)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST)
    out = jax.lax.conv_general_dilated(
        out, jnp.tile(kw, (1, 1, 1, C)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST)
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
    # true variances are >= 0; clamp away residual cancellation error so
    # the denominator below can never go negative (sigma12 may be
    # legitimately negative and stays unclamped)
    sigma1_sq = jnp.maximum(_filter2d_sep(img1 * img1, kernel) - mu1_sq, 0.)
    sigma2_sq = jnp.maximum(_filter2d_sep(img2 * img2, kernel) - mu2_sq, 0.)
    sigma12 = _filter2d_sep(img1 * img2, kernel) - mu12

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu12 + c1) * (2 * sigma12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    ssim_map = num / den
    return jnp.mean(ssim_map, axis=(1, 2, 3))
