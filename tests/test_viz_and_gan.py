"""Visualization helpers and GAN discriminator tests."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.viz import (
    frames_to_uint8,
    write_video,
    make_img_grid,
    make_enrollment_strip,
    create_video_3d,
    slerp,
    latent_interpolate,
)
from behavior_driven_video_synthesis_tpu.models.synth_discriminators import (
    PatchGANDiscriminator,
    PartDiscriminator,
    disc_loss_with_r1,
    generator_gan_loss,
    adaptive_gan_weight,
)


class TestViz:
    def test_frames_to_uint8(self):
        f = np.array([[-1.0, 0.0, 1.0]])[..., None, None]
        out = frames_to_uint8(f)
        assert out.dtype == np.uint8
        assert out.min() == 0 and out.max() == 255

    def test_write_video(self, tmp_path, rng):
        frames = (rng.rand(5, 32, 32, 3) * 255).astype(np.uint8)
        p = write_video(frames, str(tmp_path / "test.mp4"), fps=5)
        assert os.path.exists(p) and os.path.getsize(p) > 0

    def test_grid_and_strip(self, rng):
        imgs = (rng.rand(6, 16, 16, 3) * 255).astype(np.uint8)
        grid = make_img_grid(imgs, n_cols=3)
        assert grid.shape[0] == 2 * 16 + 2 and grid.shape[2] == 3
        video = (rng.rand(20, 16, 16, 3) * 255).astype(np.uint8)
        strip = make_enrollment_strip(video, n_frames=5)
        assert strip.shape[1] == 5 * 16 + 4 * 2

    def test_video_3d(self, tmp_path, rng):
        poses = rng.randn(4, 17, 3).astype(np.float32)
        frames = create_video_3d(poses, str(tmp_path / "skel.mp4"), fps=4)
        assert frames.shape[0] == 4 and frames.shape[-1] == 3
        assert os.path.exists(tmp_path / "skel.mp4")

    def test_slerp_endpoints(self, rng):
        a = rng.randn(8).astype(np.float32)
        b = rng.randn(8).astype(np.float32)
        np.testing.assert_allclose(slerp(0.0, a, b), a, atol=1e-5)
        np.testing.assert_allclose(slerp(1.0, a, b), b, atol=1e-5)
        path = latent_interpolate(a, b, 5)
        assert path.shape == (5, 8)


class TestGAN:
    def test_patchgan_map(self, rng):
        d = PatchGANDiscriminator(ndf=16, n_layers=2)
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        p = d.init(jax.random.PRNGKey(0), x)
        out = d.apply(p, x)
        assert out.shape[0] == 2 and out.shape[-1] == 1
        assert out.shape[1] > 1  # patch map, not scalar

    def test_part_disc(self, rng):
        d = PartDiscriminator(n_scales=3)
        x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        p = d.init(jax.random.PRNGKey(0), x)
        out = d.apply(p, x)
        assert out.shape == (2, 1)

    def test_disc_and_gen_losses(self, rng):
        d = PartDiscriminator(n_scales=2)
        real = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
        fake = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
        params = d.init(jax.random.PRNGKey(0), real)

        def apply_fn(p, x):
            return d.apply(p, x)

        loss, out = disc_loss_with_r1(apply_fn, params, real, fake,
                                      use_gp=True)
        assert np.isfinite(float(loss))
        assert "gp" in out and float(out["gp"]) >= 0
        g = generator_gan_loss(apply_fn, params, fake)
        assert np.isfinite(float(g))
        w = adaptive_gan_weight(jnp.asarray(0.5), jnp.asarray(0.1))
        np.testing.assert_allclose(float(w), 5.0, rtol=1e-5)

    def test_disc_loss_differentiable(self, rng):
        d = PartDiscriminator(n_scales=2)
        real = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
        fake = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
        params = d.init(jax.random.PRNGKey(0), real)

        def loss_fn(p):
            return disc_loss_with_r1(lambda pp, x: d.apply(pp, x), p,
                                     real, fake, use_gp=True)[0]

        grads = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


class TestVisualizeTransfer:
    def test_generates_videos(self, tmp_path, rng):
        from behavior_driven_video_synthesis_tpu.experiments.visualize import (
            visualize_transfer3d,
        )
        from behavior_driven_video_synthesis_tpu.models import (
            ResidualBehaviorNet,
        )
        K, H, T = 51, 32, 5
        model = ResidualBehaviorNet(n_kps=K, dim_hidden_b=H)
        x = jnp.asarray(rng.randn(2, T, K).astype(np.float32))
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "sample": jax.random.PRNGKey(1)}, x, x, T)
        batch = {"keypoints": rng.randn(2, T + 1, K).astype(np.float32)}
        paths = visualize_transfer3d(
            model, variables["params"], batch, str(tmp_path),
            jax.random.PRNGKey(2), seq_len=T, n_vids=1, n_samples=2, fps=4)
        assert len(paths) == 2
        for p in paths.values():
            assert os.path.exists(p) and os.path.getsize(p) > 0

    def test_figures_nearest_neighbours(self, rng):
        from behavior_driven_video_synthesis_tpu.viz.figures import (
            nearest_neighbours,
        )
        db = rng.randn(50, 8).astype(np.float32)
        idx, dist = nearest_neighbours(db[:3], db, k=4)
        # each query's nearest neighbour is itself
        np.testing.assert_array_equal(idx[:, 0], np.arange(3))


def test_text_to_vid_and_add_joints():
    """Small cv2 overlay helpers (reference lib/utils.py:733-751,889-911)."""
    import numpy as np
    from behavior_driven_video_synthesis_tpu.viz import (
        add_joints_to_img,
        text_to_vid,
    )
    vid = np.full((3, 64, 64, 3), 255, np.uint8)
    out = text_to_vid(vid, "hi", (5, 30))
    assert out.shape == vid.shape and out.min() < 255  # text drew black
    img = np.zeros((64, 64, 3), np.uint8)
    kps = np.array([[10, 10], [50, 50], [50, 10]])
    img = add_joints_to_img(img, kps, [(0, 1), (1, 2)],
                            color_joints=[(0, 0, 255)])
    assert img.max() == 255  # line drew


def test_behavior_startpose_grid(tmp_path, rng):
    from behavior_driven_video_synthesis_tpu.experiments.visualize import (
        make_behavior_startpose_grid,
    )
    from behavior_driven_video_synthesis_tpu.models import (
        ResidualBehaviorNet,
    )
    K, H, T = 51, 16, 4
    model = ResidualBehaviorNet(n_kps=K, dim_hidden_b=H)
    x = jnp.asarray(rng.randn(3, T, K).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)}, x, x, T)
    batch = {"keypoints": rng.randn(3, T + 1, K).astype(np.float32)}
    p = make_behavior_startpose_grid(
        model, variables["params"], batch, str(tmp_path),
        jax.random.PRNGKey(2), seq_len=T, n_behaviors=2, n_starts=2,
        fps=4)
    assert os.path.exists(p) and os.path.getsize(p) > 0
