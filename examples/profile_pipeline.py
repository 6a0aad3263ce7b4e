"""Profile the e2e behavior-transfer pipeline on the real chip and print
the per-op device-time table (core.profiling.device_op_table parses the
trace.json.gz; xprof's UI is unavailable through the relay).

Run: python examples/profile_pipeline.py [--batch 20] [--runs 3]
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.core.profiling import (
    device_op_table,
    trace,
)
from behavior_driven_video_synthesis_tpu.data.human36m import (
    detailed_joint_model,
)
from behavior_driven_video_synthesis_tpu.models import ResidualBehaviorNet
from behavior_driven_video_synthesis_tpu.models.flows import LatentFlow
from behavior_driven_video_synthesis_tpu.models.vunet import VUNet
from behavior_driven_video_synthesis_tpu.pipeline import (
    BehaviorTransferPipeline,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--spatial", type=int, default=256)
    ap.add_argument("--length", type=int, default=50)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--quant", type=str, default="none",
                    help="int8: dynamically-quantized serving convs")
    ap.add_argument("--quant-max-hw", type=int, default=0,
                    help="skip quant for convs with input H above this")
    ap.add_argument("--upsample-transpose", action="store_true",
                    help="lower subpixel upsamples as transposed convs")
    args = ap.parse_args()
    B, S, T = args.batch, args.spatial, args.length
    HID, K_FULL, K_USE = 1024, 51, 48

    jm = detailed_joint_model(world_coords=True)
    behavior = ResidualBehaviorNet(n_kps=K_USE, dim_hidden_b=HID,
                                   dtype=jnp.bfloat16)
    vunet = VUNet(spatial_size=S, nf_start=32, nf_max=128, variant="alter",
                  quant=args.quant, quant_max_hw=args.quant_max_hw,
                  upsample_transpose=args.upsample_transpose,
                  dtype=jnp.bfloat16)
    flow = LatentFlow(flow_in_channels=HID, flow_mid_channels=2 * HID,
                      n_flows=15)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    mean = rng.randn(K_FULL).astype(np.float32)
    std = (np.abs(rng.rand(K_FULL)) + 0.5).astype(np.float32)
    dim_to_use = np.arange(K_FULL)[np.arange(K_FULL) % 17 != 0][:K_USE]
    x = jnp.zeros((B, T, K_USE))
    bp = behavior.init({"params": key, "sample": key}, x, x, T)["params"]
    app = jnp.zeros((B, S, S, 3))
    vp = vunet.init({"params": key, "sample": key}, app, app)["params"]
    fv = flow.init({"params": key}, jnp.zeros((B, HID)))
    pipe = BehaviorTransferPipeline(behavior, vunet, jm, mean, std,
                                    dim_to_use, spatial_size=S,
                                    flow_model=flow)
    params = {"behavior": bp, "vunet": vp, "flow": fv}
    z = jax.random.normal(key, (B, HID))
    x_start = jnp.zeros((B, K_USE))
    extr = jnp.tile(jnp.asarray(
        np.hstack([np.eye(3), [[0], [0], [4.0]]]), jnp.float32), (B, 1, 1))
    intr = jnp.tile(jnp.asarray([1145.0, 500.0, 1143.0, 500.0]), (B, 1))
    imsize = jnp.full((B, 2), 1000.0)

    if args.quant == "int8_static":
        params["vunet_quant"] = pipe.calibrate(
            params, z[:2], x_start[:2], app[:2], extr[:2], intr[:2],
            imsize[:2], key, length=T)

    def run(k):
        out = pipe.generate(params, z, x_start, app, extr, intr, imsize, k,
                            length=T)
        return float(jnp.sum(out["frames"].astype(jnp.float32)))

    run(key)  # compile + warm
    tdir = tempfile.mkdtemp(prefix="pipe_trace_")
    with trace(tdir):
        for r in range(args.runs):
            run(jax.random.fold_in(key, r))
    rows = device_op_table(tdir, runs=args.runs)
    total_us = sum(r["us_per_run"] for r in rows)
    print(f"total device us/run: {total_us:.0f}  "
          f"({B * T / (total_us / 1e6):.0f} frames/s device-side)")
    for r in rows[:args.top]:
        m = r.get("meta") or {}
        tag = m.get("long_name") or m.get("tf_op") or m.get("name") or ""
        print(f"{r['share']:6.1%}  {r['us_per_run']:10.0f} us  {r['op']}"
              f"  {tag[:110]}")


if __name__ == "__main__":
    main()
