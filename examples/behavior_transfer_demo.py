"""End-to-end demo: train everything on synthetic data, then generate
behavior-transfer videos with the compiled pipeline.

No external data or weights needed.  Produces mp4s under ./demo_out/:
  * seq*_transfer.mp4  — GT / reconstruction / behavior-swap skeleton rows
  * seq*_samples.mp4   — diverse sampled futures
  * rgb*.mp4           — stickman + VUNet-rendered RGB frames

Run:  python examples/behavior_transfer_demo.py [--steps 200] [--size 64]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from behavior_driven_video_synthesis_tpu.core import Config
from behavior_driven_video_synthesis_tpu.core.rng import KeySeq
from behavior_driven_video_synthesis_tpu.data import SyntheticSequenceDataset
from behavior_driven_video_synthesis_tpu.data.human36m import (
    detailed_joint_model,
)
from behavior_driven_video_synthesis_tpu.experiments.visualize import (
    visualize_transfer3d,
    render_rgb_videos,
)
from behavior_driven_video_synthesis_tpu.models import (
    ClassifierAction,
    ClassifierActionBeta,
    RegressorFly,
    ResidualBehaviorNet,
)
from behavior_driven_video_synthesis_tpu.models.discriminators import (
    SequenceDiscMichael,
)
from behavior_driven_video_synthesis_tpu.models.flows import LatentFlow
from behavior_driven_video_synthesis_tpu.models.vunet import VUNet
from behavior_driven_video_synthesis_tpu.pipeline import (
    BehaviorTransferPipeline,
)
from behavior_driven_video_synthesis_tpu.train.behavior import (
    create_behavior_state,
    make_behavior_train_step,
)
from behavior_driven_video_synthesis_tpu.train.flow import (
    create_flow_state,
    make_flow_train_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--out", type=str, default="./demo_out")
    args = ap.parse_args()

    N_KPS, HID, T_FULL, BS, N_ACT = 51, 128, 25, 32, 6
    seq_len = T_FULL - 1
    ks = KeySeq(0)

    config = Config({
        "architecture": {"dim_hidden_b": HID, "cvae": False},
        "training": {"recon_loss_weight": 2.5, "weight_regressor": 0.01,
                     "use_regressor": True, "gamma_step": 1e-4,
                     "information_max": 25.0},
    })
    ds = SyntheticSequenceDataset(n_samples=1024, seq_length=T_FULL,
                                  n_kps=N_KPS, n_actions=N_ACT)
    model = ResidualBehaviorNet(n_kps=N_KPS, dim_hidden_b=HID)
    txs = {k: optax.adam(1e-3) for k in
           ["net", "regressor", "cls_action", "cls_action2", "cls_beta"]}
    models = (model, RegressorFly(n_out=N_KPS, seq_length=seq_len),
              ClassifierAction(n_classes=N_ACT, dim=64),
              SequenceDiscMichael(layers=(2, 1, 1, 1), out_dim=N_ACT),
              ClassifierActionBeta(n_classes=N_ACT))

    batch0 = next(ds.batches(BS))
    batch0 = {k: jnp.asarray(v) for k, v in batch0.items()}
    state = create_behavior_state(ks(), *models, txs, batch0, seq_len)
    step = jax.jit(make_behavior_train_step(*models, txs, config, seq_len))

    print(f"training behavior cVAE for {args.steps} steps ...")
    it = 0
    while it < args.steps:
        for batch in ds.batches(BS, seed=it):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step(state, batch, ks())
            it += 1
            if it % 50 == 0:
                print(f"  step {it}: recon="
                      f"{float(metrics['loss_recon']):.4f}")
            if it >= args.steps:
                break

    print("fitting flow prior ...")
    flow = LatentFlow(flow_in_channels=HID, flow_mid_channels=2 * HID,
                      n_flows=6)
    ftx = optax.adam(1e-3)
    seq_b = batch0["keypoints"][:, :-1]
    b0, *_ = model.apply({"params": state.net.params}, seq_b, sample=False,
                         rngs={"sample": ks()}, method=model.infer_b)
    fstate = create_flow_state(ks(), flow, ftx, b0)
    fstep = jax.jit(make_flow_train_step(model, flow, ftx, seq_len))
    for e in range(3):
        for batch in ds.batches(BS, seed=100 + e):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            fstate, fm = fstep(fstate, state.net.params, batch, ks())
        print(f"  flow epoch {e}: nll={float(fm['flow_loss']):.2f}")
    flow_vars = {"params": fstate.flow.params, "buffers": fstate.flow.buffers}

    print("generating skeleton videos ...")
    paths = visualize_transfer3d(
        model, state.net.params, next(ds.batches(4)), args.out, ks(),
        seq_len=seq_len, flow_model=flow, flow_variables=flow_vars,
        n_vids=2, n_samples=3)
    for name, p in paths.items():
        print(f"  {name}: {p}")

    print("rendering RGB videos through the compiled pipeline "
          "(untrained VUNet appearance; structure only) ...")
    S = args.size
    vunet = VUNet(spatial_size=S, nf_start=8, nf_max=32, variant="alter")
    app = jnp.zeros((2, S, S, 3))
    vp = vunet.init({"params": ks.key, "sample": ks()}, app, app)["params"]
    jm = detailed_joint_model(world_coords=True)
    mean = np.zeros(N_KPS, np.float32)
    std = np.ones(N_KPS, np.float32)
    pipe = BehaviorTransferPipeline(
        model, vunet, jm, mean, std, np.arange(N_KPS), spatial_size=S,
        stickman_thickness=2.0, flow_model=flow)
    params = {"behavior": state.net.params, "vunet": vp, "flow": flow_vars}
    z = jax.random.normal(ks(), (2, HID))
    x_start = jnp.asarray(ds.keypoints[:2, 0])
    extr = jnp.tile(jnp.asarray(
        np.hstack([np.eye(3), [[0], [0], [6.0]]]), jnp.float32), (2, 1, 1))
    intr = jnp.tile(jnp.asarray([S * 1.2, S / 2, S * 1.2, S / 2]), (2, 1))
    imsize = jnp.full((2, 2), float(S))
    rgb = render_rgb_videos(pipe, params, z, x_start, app, extr, intr,
                            imsize, ks(), args.out, length=seq_len)
    for name, p in rgb.items():
        print(f"  {name}: {p}")
    print("done — artifacts in", os.path.abspath(args.out))


if __name__ == "__main__":
    main()
