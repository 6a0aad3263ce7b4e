"""Batched, jittable 3D rotation algebra.

Behavioral contract with the reference's numpy implementations
(/root/reference/data/data_conversions_3d.py:19-175), re-designed for TPU:
every function is pure jnp, broadcasts over arbitrary leading batch axes, and
replaces data-dependent python branches with `jnp.where` so it traces under
`jit`/`vmap`.  Conventions (row-vector, zxy euler order, expmap = axis*angle)
match the H3.6M / SRNN lineage the reference follows.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = jnp.finfo(jnp.float32).eps
# Geometry matmuls are tiny (3x3); run them at full fp32 precision so the
# TPU MXU's default bf16 passthrough cannot corrupt rotation matrices.
_HIGHEST = jax.lax.Precision.HIGHEST


def _norm(x, axis=-1, keepdims=False):
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))


def euler_to_rotmat(angles, deg: bool = True, order: str = "zxy"):
    """Euler angles (..., 3) -> rotation matrices (..., 3, 3).

    ``order="zxy"`` reproduces the H36M bvh convention
    (reference data_conversions_3d.py:19-54); ``order="xyz"`` the alternative.
    """
    if deg:
        angles = jnp.radians(angles)
    ax, ay, az = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, cy, cz = jnp.cos(ax), jnp.cos(ay), jnp.cos(az)
    sx, sy, sz = jnp.sin(ax), jnp.sin(ay), jnp.sin(az)

    if order == "zxy":
        rows = [
            [cy * cz - sx * sy * sz, cy * sz + sx * sy * cz, -sy * cx],
            [-cx * sz, cx * cz, sx],
            [sy * cz + cy * sx * sz, sy * sz - cy * sx * cz, cy * cx],
        ]
        return jnp.stack(
            [jnp.stack(r, axis=-1) for r in rows], axis=-2
        )
    if order == "xyz":
        zero = jnp.zeros_like(cx)
        one = jnp.ones_like(cx)
        rz = jnp.stack(
            [jnp.stack([cz, sz, zero], -1),
             jnp.stack([-sz, cz, zero], -1),
             jnp.stack([zero, zero, one], -1)], -2)
        ry = jnp.stack(
            [jnp.stack([cy, zero, -sy], -1),
             jnp.stack([zero, one, zero], -1),
             jnp.stack([sy, zero, cy], -1)], -2)
        rx = jnp.stack(
            [jnp.stack([one, zero, zero], -1),
             jnp.stack([zero, cx, sx], -1),
             jnp.stack([zero, -sx, cx], -1)], -2)
        return jnp.matmul(jnp.matmul(rz, ry, precision=_HIGHEST), rx,
                          precision=_HIGHEST)
    raise NotImplementedError(f"euler order {order}")


def rotmat_to_euler(R):
    """Rotation matrices (..., 3, 3) -> euler angles (..., 3) (radians).

    Branchless port of the gimbal-lock-aware conversion
    (reference data_conversions_3d.py:56-86).
    """
    r02 = jnp.clip(R[..., 0, 2], -1.0, 1.0)
    locked = jnp.abs(jnp.abs(r02) - 1.0) < 1e-12

    e2 = -jnp.arcsin(r02)
    c2 = jnp.cos(e2)
    safe_c2 = jnp.where(jnp.abs(c2) < _EPS, 1.0, c2)
    e1 = jnp.arctan2(R[..., 1, 2] / safe_c2, R[..., 2, 2] / safe_c2)
    e3 = jnp.arctan2(R[..., 0, 1] / safe_c2, R[..., 0, 0] / safe_c2)

    # gimbal-lock branch: E3 := 0
    dlta = jnp.arctan2(R[..., 0, 1], R[..., 0, 2])
    e2_lock = jnp.where(r02 < 0, jnp.pi / 2, -jnp.pi / 2)
    e1_lock = jnp.where(r02 < 0, dlta, dlta)
    e3_lock = jnp.zeros_like(dlta)

    e1 = jnp.where(locked, e1_lock, e1)
    e2 = jnp.where(locked, e2_lock, e2)
    e3 = jnp.where(locked, e3_lock, e3)
    return jnp.stack([e1, e2, e3], axis=-1)


def rotmat_to_quat(R):
    """Rotation matrices (..., 3, 3) -> quaternions (..., 4) (w, x, y, z).

    Same skew-symmetric construction as reference
    data_conversions_3d.py:121-147 (stable for theta in [0, pi]).
    """
    rotdiff = R - jnp.swapaxes(R, -1, -2)
    r = jnp.stack(
        [-rotdiff[..., 1, 2], rotdiff[..., 0, 2], -rotdiff[..., 0, 1]],
        axis=-1,
    )
    sintheta = _norm(r) / 2.0
    r0 = r / (_norm(r, keepdims=True) + _EPS)
    costheta = (jnp.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0
    theta = jnp.arctan2(sintheta, costheta)
    w = jnp.cos(theta / 2.0)[..., None]
    xyz = r0 * jnp.sin(theta / 2.0)[..., None]
    return jnp.concatenate([w, xyz], axis=-1)


def quat_to_expmap(q):
    """Quaternions (..., 4) -> exponential maps (..., 3), angle in [0, pi]."""
    sinhalf = _norm(q[..., 1:])
    coshalf = q[..., 0]
    r0 = q[..., 1:] / (_norm(q[..., 1:], keepdims=True) + _EPS)
    theta = 2.0 * jnp.arctan2(sinhalf, coshalf)
    theta = jnp.mod(theta + 2.0 * jnp.pi, 2.0 * jnp.pi)
    flip = theta > jnp.pi
    theta = jnp.where(flip, 2.0 * jnp.pi - theta, theta)
    r0 = jnp.where(flip[..., None], -r0, r0)
    return r0 * theta[..., None]


def expmap_to_rotmat(r):
    """Exponential maps (..., 3) -> rotation matrices (..., 3, 3) (Rodrigues)."""
    theta = _norm(r)
    r0 = r / (theta[..., None] + _EPS)
    zero = jnp.zeros_like(theta)
    # skew-symmetric cross-product matrix of the unit axis
    K = jnp.stack(
        [
            jnp.stack([zero, -r0[..., 2], r0[..., 1]], -1),
            jnp.stack([r0[..., 2], zero, -r0[..., 0]], -1),
            jnp.stack([-r0[..., 1], r0[..., 0], zero], -1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), K.shape)
    st = jnp.sin(theta)[..., None, None]
    ct = (1.0 - jnp.cos(theta))[..., None, None]
    return eye + st * K + ct * jnp.matmul(K, K, precision=_HIGHEST)


def rotmat_to_expmap(R):
    return quat_to_expmap(rotmat_to_quat(R))
