"""Stickman rasterization: host (cv2, exact reference parity) and device
(pure JAX, batched) implementations.

The reference renders per sample with cv2 lines/fillPoly on the host
(/root/reference/lib/utils.py:325-512 `make_joint_img`).  Color scheme:
  * body polygon: BGR (0, 127, 255) fill
  * right-side limb lines: channel 1 = 255
  * left-side limb lines: channel 0 = 255
  * head/neck lines: channels 0 and 1 = 127
  * joints with negative coordinates are invalid and skipped.

The device version rasterizes a whole batch of skeletons in one XLA program
(distance-to-segment for lines, crossing-number for the body polygon) so the
compiled behavior-transfer video pipeline never leaves the chip.  It is not
bit-identical to cv2 (cv2 uses Bresenham with integer rounding; we threshold
an exact distance field) — parity tests use IoU, and the cv2 path remains
for strict-parity preprocessing.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


@dataclass(frozen=True)
class JointModel:
    """Skeleton topology + rendering metadata (reference lib/utils.py:20-26).

    Only the fields the pipeline consumes; norm_T part-warp specs live in
    data/parts.py.
    """

    body: Sequence[int]
    right_lines: Sequence[Tuple[int, int]]
    left_lines: Sequence[Tuple[int, int]]
    head_lines: Sequence[Tuple[int, int]]
    face: Sequence[Tuple[int, int]]
    rshoulder: int
    lshoulder: int
    headup: int
    kps_to_use: Sequence[int]
    total_relative_joints: Sequence[Tuple[int, int]]
    kp_to_joint: Sequence[str]
    kps_to_change: Sequence[int] = field(default_factory=list)
    kps_to_change_rel: Sequence[int] = field(default_factory=list)
    norm_T: Sequence = field(default_factory=list)


def get_line_colors(n_lines_per_channel):
    """Distinct per-line single-channel colors (reference
    lib/utils.py:51-67): for channel i with n lines, line j gets intensity
    ``(j+1) * (255 // (n+1))`` in channel i and 0 elsewhere.  Used when a
    dataset is built with ``diff_line_colors`` so each limb is separable in
    the stickman conditioning image."""
    line_colors = []
    for channel, nr_lines in enumerate(n_lines_per_channel):
        interval = int(255 // (nr_lines + 1))
        line_colors.append(
            [[(i + 1) * interval if c == channel else 0 for c in range(3)]
             for i in range(nr_lines)])
    return line_colors


def make_joint_img(img_shape, joints, joint_model: JointModel,
                   line_colors=None, color_channel=None,
                   scale_factor=None) -> np.ndarray:
    """Host/cv2 stickman — behavioral port of reference make_joint_img.

    ``line_colors`` (reference lib/utils.py:363-364,386-393,443-450): a
    3-group list from :func:`get_line_colors`; group 0 colors right_lines,
    group 1 left_lines, group 2 head_lines — matching the reference's
    indexing (its get_line_colors call sites pass (left, right, head+face)
    counts, but make_joint_img indexes [0]=right, [1]=left; both sides have
    equal line counts in every shipped joint model so the quirk is benign
    and reproduced as-is)."""
    assert cv2 is not None, "cv2 required for host stickman rendering"
    thickness = (int(img_shape[1] // scale_factor)
                 if scale_factor is not None else 1)
    imgs = [np.zeros(img_shape[:2], dtype="uint8") for _ in range(3)]

    def draw_line(a_idx, b_idx, channel_colors):
        pts = joints[[a_idx, b_idx], :]
        if np.all(pts >= 0.0):
            a = tuple(int(v) for v in pts[0])
            b = tuple(int(v) for v in pts[1])
            for ch, col in channel_colors:
                cv2.line(imgs[ch], a, b, color=col, thickness=thickness)

    def _lc(group, line_nr):
        col = line_colors[group][line_nr]
        ch = int(np.nonzero(col)[0][0])
        return [(ch, col[ch])]

    if len(joint_model.body) > 2:
        body_pts = np.array([[joints[p, :] for p in joint_model.body]])
        valid = np.all(body_pts >= 0.0, axis=-1)
        if np.count_nonzero(valid) > 2:
            poly = np.int_([body_pts[valid]])
            if color_channel is None:
                for i, c in enumerate((0, 127, 255)):
                    cv2.fillPoly(imgs[i], poly, c)
            else:
                cv2.fillPoly(imgs[color_channel], poly, 255)

    for line_nr, line in enumerate(joint_model.right_lines):
        draw_line(line[0], line[1],
                  [(color_channel, 255)] if color_channel is not None
                  else _lc(0, line_nr) if line_colors is not None
                  else [(1, 255)])
    for line_nr, line in enumerate(joint_model.left_lines):
        draw_line(line[0], line[1],
                  [(color_channel, 255)] if color_channel is not None
                  else _lc(1, line_nr) if line_colors is not None
                  else [(0, 255)])

    if len(joint_model.head_lines) == 0:
        rs = joints[joint_model.rshoulder, :]
        ls = joints[joint_model.lshoulder, :]
        cn = joints[joint_model.headup, :]
        if np.all(rs >= 0) and np.all(ls >= 0):
            neck = 0.5 * (rs + ls)
            if np.all(neck >= 0) and np.all(cn >= 0):
                a = tuple(int(v) for v in neck)
                b = tuple(int(v) for v in cn)
                if color_channel is None:
                    cv2.line(imgs[0], a, b, color=127, thickness=thickness)
                    cv2.line(imgs[1], a, b, color=127, thickness=thickness)
                else:
                    cv2.line(imgs[color_channel], a, b, color=255,
                             thickness=thickness)
    else:
        for line_nr, line in enumerate(joint_model.head_lines):
            draw_line(line[0], line[1],
                      [(color_channel, 255)] if color_channel is not None
                      else _lc(2, line_nr) if line_colors is not None
                      else [(0, 127), (1, 127)])

    img = np.stack(imgs, axis=-1)
    if img_shape[-1] == 1:
        img = np.mean(img, axis=-1)[:, :, None]
    return img


# --------------------------------------------------------------------------
# Device rasterizer
# --------------------------------------------------------------------------

def _segment_coverage(px, py, a, b, half_thickness):
    """Distance-field coverage of segments. px/py: (H, W); a/b: (L, 2).
    Returns (L, H, W) float coverage in {0, 1} (could be soft for AA)."""
    pa_x = px[None] - a[:, 0, None, None]
    pa_y = py[None] - a[:, 1, None, None]
    ab = b - a  # (L, 2)
    denom = jnp.sum(ab * ab, axis=-1)[:, None, None] + 1e-8
    t = (pa_x * ab[:, 0, None, None] + pa_y * ab[:, 1, None, None]) / denom
    t = jnp.clip(t, 0.0, 1.0)
    dx = pa_x - t * ab[:, 0, None, None]
    dy = pa_y - t * ab[:, 1, None, None]
    dist = jnp.sqrt(dx * dx + dy * dy)
    return (dist <= half_thickness).astype(jnp.float32)


def _polygon_mask(px, py, verts, valid):
    """Crossing-number point-in-polygon for a fixed vertex count.
    verts: (V, 2); valid: (V,) bool — invalid vertices are skipped by
    contracting them onto the previous valid vertex (cheap approximation of
    the reference's compaction)."""
    V = verts.shape[0]
    inside = jnp.zeros(px.shape, bool)
    for i in range(V):
        j = (i - 1) % V
        xi, yi = verts[i, 0], verts[i, 1]
        xj, yj = verts[j, 0], verts[j, 1]
        cond = ((yi > py) != (yj > py)) & (
            px < (xj - xi) * (py - yi) / (yj - yi + 1e-8) + xi
        )
        inside = inside ^ (cond & valid[i] & valid[j])
    return inside


def render_stickman(joints, joint_model: JointModel, spatial_size: int,
                    thickness: float = 1.0):
    """Device stickman: joints (..., K, 2) pixel coords -> (..., S, S, 3)
    uint8-scale float image, same color scheme as the cv2 path.

    Fully batched over leading axes via vmap; jit-compatible (static
    topology)."""
    right = jnp.asarray(np.asarray(joint_model.right_lines, np.int32))
    left = jnp.asarray(np.asarray(joint_model.left_lines, np.int32))
    head = (jnp.asarray(np.asarray(joint_model.head_lines, np.int32))
            if len(joint_model.head_lines) else None)
    body = jnp.asarray(np.asarray(joint_model.body, np.int32))

    grid = jnp.arange(spatial_size, dtype=jnp.float32) + 0.5
    px, py = jnp.meshgrid(grid, grid, indexing="xy")
    half = thickness / 2.0

    def render_one(j):
        def seg_cov(lines):
            a = j[lines[:, 0]]
            b = j[lines[:, 1]]
            valid = jnp.all(jnp.concatenate([a, b], -1) >= 0.0, axis=-1)
            cov = _segment_coverage(px, py, a, b, half)
            return jnp.max(cov * valid[:, None, None], axis=0)

        r_cov = seg_cov(right)
        l_cov = seg_cov(left)
        if head is not None:
            h_cov = seg_cov(head)
        else:
            rs, ls, cn = (j[joint_model.rshoulder], j[joint_model.lshoulder],
                          j[joint_model.headup])
            neck = 0.5 * (rs + ls)
            ok = jnp.all(jnp.stack([rs, ls, cn]) >= 0.0)
            cov = _segment_coverage(px, py, neck[None], cn[None], half)[0]
            h_cov = cov * ok

        verts = j[body]
        bvalid = jnp.all(verts >= 0.0, axis=-1)
        poly = (_polygon_mask(px, py, verts, bvalid)
                & (jnp.sum(bvalid) > 2)).astype(jnp.float32)

        ch0 = jnp.maximum(l_cov * 255.0, h_cov * 127.0)
        ch1 = jnp.maximum(r_cov * 255.0, h_cov * 127.0)
        ch2 = jnp.zeros_like(ch0)
        # body polygon painted under the lines (cv2 draws it first)
        ch0 = jnp.maximum(ch0, poly * 0.0)
        ch1 = jnp.maximum(ch1, poly * 127.0)
        ch2 = jnp.maximum(ch2, poly * 255.0)
        return jnp.stack([ch0, ch1, ch2], axis=-1)

    flat = joints.reshape((-1,) + joints.shape[-2:])
    out = jax.vmap(render_one)(flat)
    return out.reshape(joints.shape[:-2] + out.shape[1:])
