"""End-to-end behavior-transfer pipeline: one compiled program test."""
import numpy as np

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

S, HID, T = 32, 32, 6
K_FULL = 51  # 17 joints x 3
B = 2


def test_full_pipeline_one_jit():
    jm = detailed_joint_model(world_coords=True)
    rng = np.random.RandomState(0)

    behavior = ResidualBehaviorNet(n_kps=48, dim_hidden_b=HID)
    vunet = VUNet(spatial_size=S, nf_start=8, nf_max=16, variant="alter")
    flow = LatentFlow(flow_in_channels=HID, flow_mid_channels=64, n_flows=2)

    # norm stats with a few degenerate dims (48 of 51 used)
    mean = rng.randn(K_FULL).astype(np.float32)
    std = np.abs(rng.rand(K_FULL).astype(np.float32)) + 0.5
    dim_to_use = np.arange(K_FULL)[np.arange(K_FULL) % 17 != 0][:48]

    key = jax.random.PRNGKey(0)
    x = jnp.zeros((B, T, 48))
    b0 = jnp.zeros((B, HID))
    bp = behavior.init({"params": key, "sample": key}, x, x, T)["params"]
    app = jnp.zeros((B, S, S, 3))
    stick = jnp.zeros((B, S, S, 3))
    vp = vunet.init({"params": key, "sample": key}, app, stick)["params"]
    fv = flow.init({"params": key}, b0)

    pipe = BehaviorTransferPipeline(
        behavior, vunet, jm, mean, std, dim_to_use, spatial_size=S,
        flow_model=flow)

    params = {"behavior": bp, "vunet": vp, "flow": fv}
    z = jax.random.normal(key, (B, HID))
    x_start = jnp.asarray(rng.randn(B, 48).astype(np.float32))
    extr = jnp.tile(jnp.asarray(np.hstack([np.eye(3), [[0], [0], [4.0]]]),
                                jnp.float32), (B, 1, 1))
    intr = jnp.tile(jnp.asarray([40.0, S / 2, 40.0, S / 2]), (B, 1))
    imsize = jnp.full((B, 2), float(S))

    out = pipe.generate(params, z, x_start, app, extr, intr, imsize,
                        jax.random.fold_in(key, 2), length=T)
    assert out["frames"].shape == (B, T, S, S, 3)
    assert out["stickman"].shape == (B, T, S, S, 3)
    assert out["poses_3d"].shape == (B, T, 17, 3)
    assert out["keypoints_2d"].shape == (B, T, 17, 2)
    assert np.isfinite(np.asarray(out["frames"])).all()

    # reenactment path (posterior means, no flow)
    x_src = jnp.asarray(rng.randn(B, T, 48).astype(np.float32))
    out2 = pipe.reenact(params, x_src, x_start, app, extr, intr, imsize,
                        jax.random.fold_in(key, 3), length=T)
    assert out2["frames"].shape == (B, T, S, S, 3)

    # deterministic given identical inputs/keys (whole program is pure)
    out3 = pipe.generate(params, z, x_start, app, extr, intr, imsize,
                         jax.random.fold_in(key, 2), length=T)
    np.testing.assert_allclose(np.asarray(out["frames"]),
                               np.asarray(out3["frames"]), atol=0)


def test_chunked_vunet_stage_matches_unchunked():
    """B*T frames above vunet_chunk run through lax.map chunks; the frames
    must be identical to the single-batch path (it is the same pure
    function, just HBM-friendlier)."""
    jm = detailed_joint_model(world_coords=True)
    rng = np.random.RandomState(1)

    behavior = ResidualBehaviorNet(n_kps=48, dim_hidden_b=HID)
    vunet = VUNet(spatial_size=S, nf_start=8, nf_max=16, variant="alter")

    mean = rng.randn(K_FULL).astype(np.float32)
    std = np.abs(rng.rand(K_FULL).astype(np.float32)) + 0.5
    dim_to_use = np.arange(K_FULL)[np.arange(K_FULL) % 17 != 0][:48]

    key = jax.random.PRNGKey(0)
    x = jnp.zeros((B, T, 48))
    bp = behavior.init({"params": key, "sample": key}, x, x, T)["params"]
    app = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32)) * 0.3
    vp = vunet.init({"params": key, "sample": key}, app, app)["params"]

    def build(chunk):
        return BehaviorTransferPipeline(
            behavior, vunet, jm, mean, std, dim_to_use, spatial_size=S,
            vunet_chunk=chunk)

    params = {"behavior": bp, "vunet": vp, "flow": None}
    z = jax.random.normal(key, (B, HID))
    x_start = jnp.asarray(rng.randn(B, 48).astype(np.float32))
    extr = jnp.tile(jnp.asarray(np.hstack([np.eye(3), [[0], [0], [4.0]]]),
                                jnp.float32), (B, 1, 1))
    intr = jnp.tile(jnp.asarray([40.0, S / 2, 40.0, S / 2]), (B, 1))
    imsize = jnp.full((B, 2), float(S))
    args = (params, z, x_start, app, extr, intr, imsize,
            jax.random.fold_in(key, 2))

    # B*T = 12; chunk 4 -> 3 chunks, chunk 128 -> single batch
    out_chunked = build(4).generate(*args, length=T, use_flow=False)
    out_single = build(128).generate(*args, length=T, use_flow=False)
    np.testing.assert_allclose(np.asarray(out_chunked["frames"]),
                               np.asarray(out_single["frames"]),
                               atol=1e-5)
    # non-divisible guard: chunk 5 picks the largest divisor of 12 in
    # (5/2, 5] without padding
    assert build(5)._chunk_size(12) == (4, 12)
    assert build(128)._chunk_size(12) == (12, 12)
    # prime n: no divisor near the chunk -> pad up instead of collapsing
    # to tiny chunks (the silent-throughput-cliff guard)
    assert build(8)._chunk_size(13) == (8, 16)


def test_chunked_vunet_stage_pads_awkward_n():
    """A frame count with no divisor near vunet_chunk (e.g. prime B*T)
    pads up and slices — output must still match the unchunked path."""
    jm = detailed_joint_model(world_coords=True)
    rng = np.random.RandomState(2)
    T_odd = 7  # B=2 -> n=14: divisors near 4 are {}; 14 % 4 != 0 -> pad 16

    behavior = ResidualBehaviorNet(n_kps=48, dim_hidden_b=HID)
    vunet = VUNet(spatial_size=S, nf_start=8, nf_max=16, variant="alter")
    mean = rng.randn(K_FULL).astype(np.float32)
    std = np.abs(rng.rand(K_FULL).astype(np.float32)) + 0.5
    dim_to_use = np.arange(K_FULL)[np.arange(K_FULL) % 17 != 0][:48]
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((B, T_odd, 48))
    bp = behavior.init({"params": key, "sample": key}, x, x, T_odd)["params"]
    app = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32)) * 0.3
    vp = vunet.init({"params": key, "sample": key}, app, app)["params"]

    def build(chunk):
        return BehaviorTransferPipeline(
            behavior, vunet, jm, mean, std, dim_to_use, spatial_size=S,
            vunet_chunk=chunk)

    assert build(4)._chunk_size(B * T_odd) == (4, 16)
    params = {"behavior": bp, "vunet": vp, "flow": None}
    z = jax.random.normal(key, (B, HID))
    x_start = jnp.asarray(rng.randn(B, 48).astype(np.float32))
    extr = jnp.tile(jnp.asarray(np.hstack([np.eye(3), [[0], [0], [4.0]]]),
                                jnp.float32), (B, 1, 1))
    intr = jnp.tile(jnp.asarray([40.0, S / 2, 40.0, S / 2]), (B, 1))
    imsize = jnp.full((B, 2), float(S))
    args = (params, z, x_start, app, extr, intr, imsize,
            jax.random.fold_in(key, 2))
    out_padded = build(4).generate(*args, length=T_odd, use_flow=False)
    out_single = build(128).generate(*args, length=T_odd, use_flow=False)
    assert out_padded["frames"].shape == out_single["frames"].shape
    np.testing.assert_allclose(np.asarray(out_padded["frames"]),
                               np.asarray(out_single["frames"]),
                               atol=1e-5)
