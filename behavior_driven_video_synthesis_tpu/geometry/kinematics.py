"""Forward kinematics over the 32-joint Human3.6M skeleton.

TPU-first re-design of the reference's per-sample numpy loop
(/root/reference/data/data_conversions_3d.py:608-668 `fkl`, :706-889
`kinematic_tree`): the tree is static, so the 32-step accumulation is unrolled
inside `jit` while everything is batched over arbitrary leading axes — one
compiled call replaces the reference's per-frame python loop
(human36m.py:808-848).

Tree constants (parents, rotation-index layout) come from the reference's
`metadata.xml`; bone offsets are the projection-accurate variant hardcoded at
data_conversions_3d.py:784-886 (values are H3.6M skeleton data, not code).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .rotations import (
    euler_to_rotmat,
    expmap_to_rotmat,
    rotmat_to_expmap,
)

# Parent of each of the 32 joints (-1 = root), topologically ordered.
H36M_PARENTS = np.array(
    [-1, 0, 1, 2, 3, 4, 0, 6, 7, 8, 9, 0, 11, 12, 13, 14, 12, 16, 17, 18,
     19, 20, 19, 22, 12, 24, 25, 26, 27, 28, 27, 30], dtype=np.int32
)

H36M_JOINT_NAMES = [
    "Hips", "RightUpLeg", "RightLeg", "RightFoot", "RightToeBase", "Site",
    "LeftUpLeg", "LeftLeg", "LeftFoot", "LeftToeBase", "Site", "Spine",
    "Spine1", "Neck", "Head", "Site", "LeftShoulder", "LeftArm",
    "LeftForeArm", "LeftHand", "LeftHandThumb", "Site", "L_Wrist_End",
    "Site", "RightShoulder", "RightArm", "RightForeArm", "RightHand",
    "RightHandThumb", "Site", "R_Wrist_End", "Site",
]

# Bone offsets in millimetres, (32, 3).
H36M_OFFSETS = np.array(
    [
        [0.0, 0.0, 0.0],
        [-132.948591, 0.0, 0.0],
        [0.0, -442.894612, 0.0],
        [0.0, -454.206447, 0.0],
        [0.0, 0.0, 162.767078],
        [0.0, 0.0, 74.999437],
        [132.948826, 0.0, 0.0],
        [0.0, -442.894413, 0.0],
        [0.0, -454.206590, 0.0],
        [0.0, 0.0, 162.767426],
        [0.0, 0.0, 74.999948],
        [0.0, 0.1, 0.0],
        [0.0, 233.383263, 0.0],
        [0.0, 257.077681, 0.0],
        [0.0, 121.134938, 0.0],
        [0.0, 115.002227, 0.0],
        [0.0, 257.077681, 0.0],
        [0.0, 151.034226, 0.0],
        [0.0, 278.882773, 0.0],
        [0.0, 251.733451, 0.0],
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 99.999627],
        [0.0, 100.000188, 0.0],
        [0.0, 0.0, 0.0],
        [0.0, 257.077681, 0.0],
        [0.0, 151.031437, 0.0],
        [0.0, 278.892924, 0.0],
        [0.0, 251.728680, 0.0],
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 99.999888],
        [0.0, 137.499922, 0.0],
        [0.0, 0.0, 0.0],
    ],
    dtype=np.float32,
)

# Per-joint indices into the 78-d euler (bvh) channel vector; [] = fixed joint.
H36M_ROT_IND = [
    [4, 5, 3], [7, 8, 6], [10, 11, 9], [13, 14, 12], [16, 17, 15], [],
    [19, 20, 18], [22, 23, 21], [25, 26, 24], [28, 29, 27], [],
    [31, 32, 30], [34, 35, 33], [37, 38, 36], [40, 41, 39], [],
    [43, 44, 42], [46, 47, 45], [49, 50, 48], [52, 53, 51], [55, 56, 54],
    [], [58, 59, 57], [], [61, 62, 60], [64, 65, 63], [67, 68, 66],
    [70, 71, 69], [73, 74, 72], [], [76, 77, 75], [],
]

# Expmap layout of the 99-d angle vector: [:3] root translation, [3:99] are
# 32 consecutive (3,) exponential maps.
H36M_EXPMAP_IND = [list(range(3 + 3 * i, 6 + 3 * i)) for i in range(32)]
H36M_POS_IND = [0, 1, 2]

N_JOINTS = 32


def _local_rotations_expmap(angles):
    """angles (..., 99) -> local joint rotations (..., 32, 3, 3)."""
    exps = angles[..., 3:99].reshape(angles.shape[:-1] + (N_JOINTS, 3))
    return expmap_to_rotmat(exps)


def _local_rotations_euler(angles):
    """angles (..., 78) in degrees (bvh) -> local rotations (..., 32, 3, 3)."""
    mats = []
    for i in range(N_JOINTS):
        if len(H36M_ROT_IND[i]) == 0:
            eul = jnp.zeros(angles.shape[:-1] + (3,), angles.dtype)
        else:
            eul = angles[..., jnp.array(H36M_ROT_IND[i])]
        mats.append(euler_to_rotmat(eul, deg=True, order="zxy"))
    return jnp.stack(mats, axis=-3)


def forward_kinematics(angles, use_euler: bool = False,
                       use_pos: bool = True):
    """Convert joint angles into 3D joint positions.

    Args:
      angles: (..., 99) expmap channels (root translation + 32 expmaps), or
        (..., 78) bvh euler channels when ``use_euler``.
      use_euler: interpret channels as degrees-euler bvh format.
      use_pos: add the root translation from the first 3 channels (expmap
        format only; mirrors ``posInd`` in the reference).

    Returns:
      xyz: (..., 32, 3) joint positions.  Matches reference ``fkl``
      (data_conversions_3d.py:608-668) up to float error, batched.
    """
    if use_euler:
        local_R = _local_rotations_euler(angles)
        root_pos = jnp.zeros(angles.shape[:-1] + (3,), angles.dtype)
    else:
        local_R = _local_rotations_expmap(angles)
        if use_pos:
            root_pos = angles[..., :3]
        else:
            root_pos = jnp.zeros(angles.shape[:-1] + (3,), angles.dtype)

    offsets = jnp.asarray(H36M_OFFSETS, angles.dtype)

    # Row-vector convention (reference: offset·R_parent + xyz_parent,
    # R_global = R_local·R_parent).  Static 32-step unroll — cheap to trace,
    # fully batched over leading axes.
    hi = jax.lax.Precision.HIGHEST
    xyz = [None] * N_JOINTS
    glob_R = [None] * N_JOINTS
    xyz[0] = offsets[0] + root_pos
    glob_R[0] = local_R[..., 0, :, :]
    for i in range(1, N_JOINTS):
        p = int(H36M_PARENTS[i])
        xyz[i] = (
            jnp.einsum("k,...kj->...j", offsets[i], glob_R[p], precision=hi)
            + xyz[p]
        )
        glob_R[i] = jnp.matmul(local_R[..., i, :, :], glob_R[p], precision=hi)
    return jnp.stack(xyz, axis=-2)


def revert_coordinate_space(channels, R0=None, T0=None):
    """Re-arrange root rotation/translation of an expmap sequence so that the
    pose series is well-placed for visualization.

    Args:
      channels: (T, 99) expmap channels.
      R0: (3, 3) initial root rotation (default identity).
      T0: (3,) initial root translation (default zeros).

    Returns:
      (T, 99) channels with accumulated root transform, matching reference
      ``revert_coordinate_space`` (data_conversions_3d.py:671-703) but as a
      single `lax.scan` instead of a python loop.
    """
    channels = jnp.asarray(channels)
    if R0 is None:
        R0 = jnp.eye(3, dtype=channels.dtype)
    if T0 is None:
        T0 = jnp.zeros(3, dtype=channels.dtype)

    hi = jax.lax.Precision.HIGHEST

    def step(carry, ch):
        R_prev, T_prev = carry
        R_diff = expmap_to_rotmat(ch[3:6])
        R = jnp.matmul(R_diff, R_prev, precision=hi)
        root_exp = rotmat_to_expmap(R)
        T = T_prev + jnp.matmul(R_prev.T, ch[:3], precision=hi)
        out = jnp.concatenate([T, root_exp, ch[6:]])
        return (R, T), out

    (_, _), out = jax.lax.scan(step, (R0, T0), channels)
    return out
