"""Paper-figure entry points (reference lib/figures.py:458,687,1388,1810):
one generated artifact per reference figure family, driven through the
compiled pipeline on tiny shapes."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.data.human36m import (
    detailed_joint_model,
)
from behavior_driven_video_synthesis_tpu.models import ResidualBehaviorNet
from behavior_driven_video_synthesis_tpu.models.flows import LatentFlow
from behavior_driven_video_synthesis_tpu.models.vunet import VUNet
from behavior_driven_video_synthesis_tpu.pipeline import (
    BehaviorTransferPipeline,
)
from behavior_driven_video_synthesis_tpu.experiments.visualize import (
    latent_interpolate_eval_figures,
    make_enrollment_figures,
    sample_examples_single_figures,
)
from behavior_driven_video_synthesis_tpu.viz.figures import (
    nearest_neighbour_figure,
    nearest_neighbours,
    sample_examples_grid,
)

S, HID, T = 32, 16, 6
K_FULL = 51
KN = 48


def _setup():
    jm = detailed_joint_model(world_coords=True)
    rng = np.random.RandomState(0)
    behavior = ResidualBehaviorNet(n_kps=KN, dim_hidden_b=HID)
    vunet = VUNet(spatial_size=S, nf_start=4, nf_max=8, variant="alter")
    flow = LatentFlow(flow_in_channels=HID, flow_mid_channels=32, n_flows=2)
    mean = rng.randn(K_FULL).astype(np.float32)
    std = np.abs(rng.rand(K_FULL).astype(np.float32)) + 0.5
    dim_to_use = np.arange(K_FULL)[np.arange(K_FULL) % 17 != 0][:KN]
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, T, KN))
    bp = behavior.init({"params": key, "sample": key}, x, x, T)["params"]
    app = jnp.zeros((2, S, S, 3))
    vp = vunet.init({"params": key, "sample": key}, app, app)["params"]
    fv = flow.init({"params": key}, jnp.zeros((2, HID)))
    pipe = BehaviorTransferPipeline(behavior, vunet, jm, mean, std,
                                    dim_to_use, spatial_size=S,
                                    flow_model=flow)
    params = {"behavior": bp, "vunet": vp, "flow": fv}
    return pipe, behavior, params, rng


@pytest.mark.e2e  # compiles the full pipeline; slow tier
def test_enrollment_figures(tmp_path):
    pipe, behavior, params, rng = _setup()
    C = 2  # cameras
    src = rng.randn(T, KN).astype(np.float32)
    start = rng.randn(KN).astype(np.float32)
    apps = rng.rand(C, S, S, 3).astype(np.float32) * 2 - 1
    extr = np.tile(np.hstack([np.eye(3), [[0], [0], [4.0]]]
                             ).astype(np.float32), (C, 1, 1))
    intr = np.tile(np.asarray([40.0, S / 2, 40.0, S / 2], np.float32),
                   (C, 1))
    sizes = np.full((C, 2), float(S), np.float32)
    paths = make_enrollment_figures(
        pipe, params, src, start, apps, extr, intr, sizes,
        jax.random.PRNGKey(1), str(tmp_path), length=T, disc_step=2)
    for k in ("kps", "rgb", "overlay", "video"):
        assert os.path.exists(paths[k]), k


@pytest.mark.e2e  # compiles the full pipeline; slow tier
def test_latent_interpolate_eval_figures(tmp_path):
    pipe, behavior, params, rng = _setup()
    C = 2
    kps1 = rng.randn(T + 1, KN).astype(np.float32)
    kps2 = rng.randn(T + 1, KN).astype(np.float32)
    apps = rng.rand(C, S, S, 3).astype(np.float32) * 2 - 1
    extr = np.tile(np.hstack([np.eye(3), [[0], [0], [4.0]]]
                             ).astype(np.float32), (C, 1, 1))
    intr = np.tile(np.asarray([40.0, S / 2, 40.0, S / 2], np.float32),
                   (C, 1))
    sizes = np.full((C, 2), float(S), np.float32)
    paths = latent_interpolate_eval_figures(
        pipe, behavior, params, kps1, kps2, apps, extr, intr, sizes,
        jax.random.PRNGKey(2), str(tmp_path), n_steps=3, length=T,
        disc_step=2)
    assert os.path.exists(paths["slerp_cam0_png"])
    assert os.path.exists(paths["linear_cam1_mp4"])
    assert len(paths) == 2 * C * 2  # {slerp,linear} x cams x {png,mp4}


@pytest.mark.e2e  # compiles the full pipeline; slow tier
def test_sample_examples_single_figures(tmp_path):
    pipe, behavior, params, rng = _setup()
    kps1 = rng.randn(T + 1, KN).astype(np.float32)
    kps2 = rng.randn(T + 1, KN).astype(np.float32)
    app = rng.rand(S, S, 3).astype(np.float32) * 2 - 1
    extr = np.hstack([np.eye(3), [[0], [0], [4.0]]]).astype(np.float32)
    intr = np.asarray([40.0, S / 2, 40.0, S / 2], np.float32)
    size = np.asarray([float(S)] * 2, np.float32)
    paths = sample_examples_single_figures(
        pipe, behavior, params, kps1, kps2, app, extr, intr, size,
        jax.random.PRNGKey(3), str(tmp_path), n_samples=2, length=T,
        disc_step=2)
    assert os.path.exists(paths["png"]) and os.path.exists(paths["mp4"])


def test_nearest_neighbours_and_grid(tmp_path):
    rng = np.random.RandomState(0)
    q = rng.randn(3, 8).astype(np.float32)
    db = np.concatenate([q + 1e-4, rng.randn(5, 8).astype(np.float32)])
    idx, dist = nearest_neighbours(q, db, k=2)
    assert list(idx[:, 0]) == [0, 1, 2]  # each query finds its twin
    vids = (rng.rand(2, T, S, S, 3) * 255).astype(np.uint8)
    grid = sample_examples_grid(vids, n_frames=3)
    assert grid.ndim == 3 and grid.shape[-1] == 3


def test_nearest_neighbour_figure(tmp_path):
    rng = np.random.RandomState(0)
    p = nearest_neighbour_figure(
        rng.randn(6, 5).astype(np.float32),
        rng.randn(6, 4, 51).astype(np.float32),
        rng.randint(0, 3, 6), str(tmp_path / "nn.png"),
        n_queries=2, k=2, n_frames=3)
    assert os.path.exists(p) and os.path.getsize(p) > 0
