"""Profile the cvbae (VUNet-alter) TRAIN step on the real chip: img/s plus
the per-op device-time table (core.profiling.device_op_table).

The reference's most expensive run is cvbae training — 150k iterations at
batch 12, 256px (/root/reference/config/shape_and_pose_net.yaml:44-58) —
so train-step throughput sets the cost of reproducing it.  This drives
the SAME jitted step the experiment uses (train/vunet_exp.py), with the
train state donated (big params + adam moments must not be double-
buffered, see ROADMAP) and a key-dependent perturbation of the batch per
iteration so XLA cannot hoist the target VGG features out of the loop.

Run: python examples/profile_train.py [--batch 12] [--steps 8] [--runs 3]
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from behavior_driven_video_synthesis_tpu.core.config import Config
from behavior_driven_video_synthesis_tpu.core.profiling import (
    device_op_table,
    trace,
)
from behavior_driven_video_synthesis_tpu.models.perceptual import (
    LaplacianPyramidFeatures,
    PerceptualVGG19,
)
from behavior_driven_video_synthesis_tpu.models.vunet import (
    VunetRegressor,
    VUNet,
    compute_n_scales,
)
from behavior_driven_video_synthesis_tpu.train.vunet_exp import (
    create_vunet_state,
    make_cvbae_train_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--spatial", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8,
                    help="timed steps per run")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--perceptual", type=str, default="vgg",
                    choices=["vgg", "laplacian"])
    ap.add_argument("--no-regressor", action="store_true")
    ap.add_argument("--remat", nargs="?", const="subnet", default=False,
                    choices=["rnb", "subnet"],
                    help="rematerialize in backward (training.remat): "
                         "per-RNB or per-subnet — HBM for FLOPs")
    args = ap.parse_args()
    B, S = args.batch, args.spatial

    config = Config({
        "architecture": {"cvae": False},
        "training": {"ll_weight": 1.0, "weight_regressor": 4.0,
                     "train_regressor": not args.no_regressor,
                     "gamma_step": 1e-5, "information_max": 1000.0,
                     "n_init_batches": 4},
    })
    vunet = VUNet(spatial_size=S, nf_start=32, nf_max=128, variant="alter",
                  remat=args.remat, dtype=jnp.bfloat16)
    if args.perceptual == "vgg":
        vgg = PerceptualVGG19()
    else:
        vgg = LaplacianPyramidFeatures()
    vgg_vars = vgg.init(jax.random.PRNGKey(1), jnp.zeros((1, S, S, 3)))

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    batch = {
        "app_img": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "pose_img": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "stickman": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "reg_imgs": jnp.asarray(rng.rand(B, 1, S, S, 3) * 2 - 1,
                                jnp.float32),
        "reg_targets": jnp.asarray(rng.rand(B, 1, 17, 2), jnp.float32),
    }
    if args.no_regressor:
        regressor = None
    else:
        n_scales = compute_n_scales(S, 2, 0)
        bottleneck = S // 2 ** (n_scales - 1)
        regressor = VunetRegressor(
            n_out=34, latent_widths=[bottleneck * 2 ** i for i in range(2)])
    txs = {"vunet": optax.adam(5e-4), "regressor": optax.adam(5e-4)}
    state = create_vunet_state(key, vunet, regressor, vgg, txs, batch)
    step_fn = make_cvbae_train_step(vunet, regressor, vgg, vgg_vars, txs,
                                    config)

    def run_steps(state, key):
        def body(i, carry):
            st, k = carry
            k, ks, kb = jax.random.split(k, 3)
            # key-dependent batch perturbation: keeps the per-step batch
            # fresh so target VGG features can't be hoisted out of the loop
            b = dict(batch)
            b["pose_img"] = batch["pose_img"] + 1e-3 * jax.random.normal(
                kb, batch["pose_img"].shape, batch["pose_img"].dtype)
            st, _ = step_fn(st, b, ks)
            return (st, k)
        return jax.lax.fori_loop(0, args.steps, body, (state, key))[0]

    jstep = jax.jit(run_steps, donate_argnums=(0,))
    state = jstep(state, key)  # compile + warm
    float(jnp.sum(state.gamma))  # force completion (relay lies on b_u_r)

    times = []
    tdir = tempfile.mkdtemp(prefix="train_trace_")
    with trace(tdir):
        for r in range(args.runs):
            t0 = time.perf_counter()
            state = jstep(state, jax.random.fold_in(key, r))
            float(jnp.sum(state.gamma))
            times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"cvbae train {S}px B={B} perceptual={args.perceptual}"
          f"{' remat=' + args.remat if args.remat else ''}: "
          f"{best / args.steps * 1e3:.1f} ms/step = "
          f"{B * args.steps / best:.1f} img/s (best of {args.runs})")
    rows = device_op_table(tdir, runs=args.runs)
    total_us = sum(r["us_per_run"] for r in rows)
    if total_us > 0:
        print(f"total device us/run: {total_us:.0f} "
              f"({B * args.steps / (total_us / 1e6):.0f} img/s device-side)")
    else:
        print("total device us/run: 0 (no device ops in trace — CPU run?)")
    for r in rows[:args.top]:
        m = r.get("meta") or {}
        tag = m.get("long_name") or m.get("tf_op") or m.get("name") or ""
        print(f"{r['share']:6.1%}  {r['us_per_run']:10.0f} us  {r['op']}"
              f"  {tag[:110]}")


if __name__ == "__main__":
    main()
