"""Geometry layer tests.

Golden values in tests/golden/geometry_golden.npz were generated once from the
reference numpy implementations (/root/reference/data/data_conversions_3d.py)
on fixed seeds; the JAX implementations must reproduce them batched.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.geometry import (
    euler_to_rotmat,
    rotmat_to_euler,
    rotmat_to_quat,
    quat_to_expmap,
    expmap_to_rotmat,
    rotmat_to_expmap,
    forward_kinematics,
    revert_coordinate_space,
    apply_affine_transform,
    camera_projection,
    normalization_stats,
    normalize,
    unnormalize,
)

GOLDEN = np.load(
    os.path.join(os.path.dirname(__file__), "golden", "geometry_golden.npz")
)


class TestRotations:
    def test_expmap_to_rotmat_golden(self):
        out = expmap_to_rotmat(jnp.asarray(GOLDEN["exp_in"]))
        np.testing.assert_allclose(out, GOLDEN["rot_out"], atol=1e-5)

    def test_euler_to_rotmat_golden(self):
        out = euler_to_rotmat(jnp.asarray(GOLDEN["eul_in"]), deg=True,
                              order="zxy")
        np.testing.assert_allclose(out, GOLDEN["eulrot_out"], atol=1e-5)

    def test_rotmat_to_euler_golden(self):
        out = rotmat_to_euler(jnp.asarray(GOLDEN["rot_out"]))
        np.testing.assert_allclose(out, GOLDEN["r2e_out"], atol=1e-5)

    def test_rotmat_to_quat_golden(self):
        out = rotmat_to_quat(jnp.asarray(GOLDEN["rot_out"]))
        np.testing.assert_allclose(out, GOLDEN["quat_out"], atol=1e-5)

    def test_rotmat_to_expmap_golden(self):
        out = rotmat_to_expmap(jnp.asarray(GOLDEN["rot_out"]))
        np.testing.assert_allclose(out, GOLDEN["r2exp_out"], atol=1e-5)

    def test_expmap_roundtrip(self, rng):
        r = rng.randn(64, 3).astype(np.float32)
        # keep |r| < pi so expmap is unique
        r = r / (np.linalg.norm(r, axis=-1, keepdims=True) + 1e-9)
        r = r * rng.uniform(0.01, 3.0, (64, 1)).astype(np.float32)
        back = rotmat_to_expmap(expmap_to_rotmat(jnp.asarray(r)))
        np.testing.assert_allclose(back, r, atol=1e-4)

    def test_rotmat_orthonormal(self, rng):
        r = rng.randn(32, 3).astype(np.float32)
        R = expmap_to_rotmat(jnp.asarray(r))
        eye = jnp.einsum("...ij,...kj->...ik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0,
                                   atol=1e-5)

    def test_jit_and_vmap(self):
        f = jax.jit(expmap_to_rotmat)
        out = f(jnp.asarray(GOLDEN["exp_in"]))
        np.testing.assert_allclose(out, GOLDEN["rot_out"], atol=1e-5)


class TestKinematics:
    def test_fk_golden_batched(self):
        xyz = forward_kinematics(jnp.asarray(GOLDEN["fk_angles"]))
        np.testing.assert_allclose(xyz, GOLDEN["fk_xyz"], rtol=1e-5,
                                   atol=2e-2)

    def test_fk_jit(self):
        f = jax.jit(forward_kinematics)
        xyz = f(jnp.asarray(GOLDEN["fk_angles"]))
        np.testing.assert_allclose(xyz, GOLDEN["fk_xyz"], rtol=1e-5,
                                   atol=2e-2)

    def test_fk_extra_batch_dims(self):
        angles = jnp.asarray(GOLDEN["fk_angles"]).reshape(2, 3, 99)
        xyz = forward_kinematics(angles)
        assert xyz.shape == (2, 3, 32, 3)
        np.testing.assert_allclose(
            xyz.reshape(6, 32, 3), GOLDEN["fk_xyz"], rtol=1e-5, atol=2e-2
        )

    def test_revert_coordinate_space_golden(self):
        out = revert_coordinate_space(jnp.asarray(GOLDEN["rcs_in"]))
        np.testing.assert_allclose(out, GOLDEN["rcs_out"], atol=1e-4)


class TestCamera:
    def test_affine_golden(self):
        out = apply_affine_transform(
            jnp.asarray(GOLDEN["cam_pts"]), jnp.asarray(GOLDEN["cam_M"])
        )
        np.testing.assert_allclose(out, GOLDEN["cam_out"], atol=1e-5)

    def test_projection_golden(self):
        out = camera_projection(
            jnp.asarray(GOLDEN["proj_in"]), jnp.asarray(GOLDEN["cam_params"])
        )
        np.testing.assert_allclose(out, GOLDEN["proj_out"], rtol=1e-6,
                                   atol=1e-3)

    def test_projection_batched(self):
        pts = jnp.stack([jnp.asarray(GOLDEN["proj_in"])] * 4)
        out = camera_projection(pts, jnp.asarray(GOLDEN["cam_params"]))
        assert out.shape == (4,) + GOLDEN["proj_out"].shape


class TestNormalization:
    def test_stats_golden(self):
        stats = normalization_stats(GOLDEN["norm_data"])
        np.testing.assert_allclose(stats.mean, GOLDEN["norm_mean"], atol=1e-5)
        np.testing.assert_allclose(stats.std, GOLDEN["norm_std"], atol=1e-5)
        np.testing.assert_array_equal(stats.dim_to_use, GOLDEN["norm_duse"])
        np.testing.assert_array_equal(stats.dim_to_ignore, GOLDEN["norm_dign"])

    def test_normalize_golden(self):
        stats = normalization_stats(GOLDEN["norm_data"])
        normed = normalize(GOLDEN["norm_data"], stats)
        np.testing.assert_allclose(normed, GOLDEN["normed"], atol=1e-5)

    def test_unnormalize_golden(self):
        stats = normalization_stats(GOLDEN["norm_data"])
        un = unnormalize(GOLDEN["normed"], stats)
        np.testing.assert_allclose(un, GOLDEN["unnorm"], atol=1e-4)

    def test_roundtrip(self):
        stats = normalization_stats(GOLDEN["norm_data"])
        normed = normalize(GOLDEN["norm_data"], stats)
        back = unnormalize(normed, stats)
        # used dims must round-trip exactly; ignored dims go to their mean
        np.testing.assert_allclose(
            np.asarray(back)[:, stats.dim_to_use],
            GOLDEN["norm_data"][:, stats.dim_to_use],
            atol=1e-4,
        )
