"""Bounding boxes and keypoint-centered crops.

Behavioral ports of /root/reference/lib/utils.py:616-655
(`get_bounding_box`: square box from keypoints with relax padding +
out-of-image padding bookkeeping) and :530-613 (the kornia batched crop,
here a jittable jax crop-and-resize over a batch).
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def get_bounding_box(pts: np.ndarray, img_shape, relax: float = 0.1
                     ) -> Dict[str, np.ndarray]:
    """Square bbox [x_tl, x_br, y_tl, y_br] + reflect-padding amounts."""
    pts = np.asarray(pts[:, :2], np.float32)
    x, y = pts[:, 0].min(), pts[:, 1].min()
    w = pts[:, 0].max() - x
    h = pts[:, 1].max() - y
    x, y, w, h = int(x), int(y), int(np.ceil(w)), int(np.ceil(h))
    if w >= h:
        x_tl = int(x - relax * w)
        x_br = int(x + (1.0 + relax) * w)
        y_tl = int((2 * y + h - (x_br - x_tl)) / 2)
        y_br = int((2 * y + h + (x_br - x_tl)) / 2)
    else:
        y_tl = int(y - relax * h)
        y_br = int(y + (1.0 + relax) * h)
        x_tl = int((2 * x + w - (y_br - y_tl)) / 2)
        x_br = int((2 * x + w + (y_br - y_tl)) / 2)
    bbox = [x_tl, x_br, y_tl, y_br]
    pad_left = abs(min(0, bbox[0]))
    pad_right = abs(max(0, bbox[1] - img_shape[1]))
    pad_top = abs(min(0, bbox[2]))
    pad_bottom = abs(max(0, bbox[3] - img_shape[0]))
    bbox[0] += pad_left
    bbox[1] += pad_left + pad_right
    bbox[2] += pad_top
    bbox[3] += pad_top + pad_bottom
    return {"bbox": bbox,
            "pads": np.asarray([pad_left, pad_right, pad_top, pad_bottom],
                               np.int64)}


def crop_with_bbox(img: np.ndarray, kps: np.ndarray,
                   relax: float = 0.1) -> np.ndarray:
    """Crop a square keypoint-centered region, reflect-padding at borders
    (the reference's use_crops path, data/base_dataset.py:292-308)."""
    crop = get_bounding_box(kps, img.shape, relax)
    bbox, pads = crop["bbox"], crop["pads"]
    if np.any(pads > 0):
        img = cv2.copyMakeBorder(img, pads[2], pads[3], pads[0], pads[1],
                                 borderType=cv2.BORDER_REFLECT)
    return img[bbox[2]:bbox[3], bbox[0]:bbox[1]]


def bounding_box_batch(kps, imgs, out_size: int, relax: float = 0.1):
    """Batched, jittable keypoint-centered square crop-and-resize.

    TPU replacement of the kornia path (reference lib/utils.py:530-613):
    per-sample square box from keypoint extents, bilinear-resampled to
    (out_size, out_size) with edge clamping — one fused XLA program.

    kps: (B, K, 2) pixel coords; imgs: (B, H, W, C) floats.
    """
    B, H, W, C = imgs.shape

    x_min = jnp.min(kps[..., 0], axis=1)
    x_max = jnp.max(kps[..., 0], axis=1)
    y_min = jnp.min(kps[..., 1], axis=1)
    y_max = jnp.max(kps[..., 1], axis=1)
    w = x_max - x_min
    h = y_max - y_min
    side = jnp.maximum(w, h) * (1.0 + 2 * relax)
    cx = (x_min + x_max) / 2
    cy = (y_min + y_max) / 2

    # normalized sample grid per batch element
    lin = (jnp.arange(out_size) + 0.5) / out_size - 0.5  # [-0.5, 0.5)
    gx = cx[:, None] + side[:, None] * lin[None, :]      # (B, S)
    gy = cy[:, None] + side[:, None] * lin[None, :]

    gx = jnp.clip(gx, 0.0, W - 1.0)
    gy = jnp.clip(gy, 0.0, H - 1.0)

    def sample_one(img, gxr, gyr):
        x0 = jnp.floor(gxr).astype(jnp.int32)
        y0 = jnp.floor(gyr).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, W - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        fx = (gxr - x0)[None, :, None]
        fy = (gyr - y0)[:, None, None]
        v00 = img[y0[:, None], x0[None, :]]
        v01 = img[y0[:, None], x1[None, :]]
        v10 = img[y1[:, None], x0[None, :]]
        v11 = img[y1[:, None], x1[None, :]]
        return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
                + v10 * (1 - fx) * fy + v11 * fx * fy)

    return jax.vmap(sample_one)(imgs, gx, gy)


def part_crops_batch(kps, imgs, part_indices, out_size: int,
                     relax: float = 0.3):
    """Crops around a keypoint subset (head/hands) for part-focused losses —
    the kornia `get_img_crop` equivalent (reference lib/utils.py:235-322)."""
    sub = jnp.asarray(np.asarray(part_indices))
    return bounding_box_batch(kps[:, sub], imgs, out_size, relax=relax)
