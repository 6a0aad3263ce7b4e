"""Camera transforms: world->camera affine + pinhole projection.

Batched jnp versions of reference data_conversions_3d.py:588-605
(`apply_affine_transform`) and :892-912 (`camera_projection`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# 3x3/3x4 matmuls must stay exact fp32 on TPU (no bf16 MXU passthrough).
_HI = jax.lax.Precision.HIGHEST


def apply_affine_transform(x, M):
    """Affine transform R·x + t with M = [R | t] ∈ R^{3x4}.

    Args:
      x: (..., 3) points.
      M: (..., 3, 4) affine matrices (broadcastable against x's batch dims).

    Returns:
      (..., 3) transformed points.
    """
    R = M[..., :, :3]
    t = M[..., :, 3]
    return jnp.einsum("...ij,...j->...i", R, x, precision=_HI) + t


def intrinsics_matrix(camera_parameters):
    """(f_x, x_0, f_y, y_0) -> 3x3 intrinsic matrix (batched over leading axes)."""
    cp = jnp.asarray(camera_parameters)
    f_x, x_0, f_y, y_0 = cp[..., 0], cp[..., 1], cp[..., 2], cp[..., 3]
    zero = jnp.zeros_like(f_x)
    one = jnp.ones_like(f_x)
    return jnp.stack(
        [
            jnp.stack([f_x, zero, x_0], -1),
            jnp.stack([zero, f_y, y_0], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        axis=-2,
    )


def camera_projection(poses, camera_parameters):
    """Pinhole-project camera-frame 3D points to the image plane.

    Args:
      poses: (..., K, 3) camera-frame points.
      camera_parameters: (..., 4) as (f_x, x_0, f_y, y_0).

    Returns:
      (..., K, 2) pixel coordinates.
    """
    K = intrinsics_matrix(camera_parameters)
    z = poses[..., -1:]
    poses3d = poses / z
    proj = jnp.einsum("...ij,...kj->...ki", K, poses3d, precision=_HI)
    return proj[..., :2]


def project_world_to_image(world_points, extrinsics, camera_parameters):
    """world (..., K, 3) -> pixels (..., K, 2) via [R|t] then pinhole."""
    cam = apply_affine_transform(world_points, extrinsics[..., None, :, :])
    return camera_projection(cam, camera_parameters)
