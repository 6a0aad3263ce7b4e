"""Profile ONE cvbae train step on the chip: device self-time bucketed
into conv / rng / dropout-apply / copy / other (core.profiling.
device_op_table).  Used to attribute the measured dropout cost
(CVBAE_RECONCILE.json: threefry 92.7 -> rbg 101.8 -> no-dropout 130.5
img/s at B=12/256px) to bit GENERATION vs mask APPLY bandwidth.

Run: python examples/profile_cvbae_step.py [--dropout-rng rbg]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))

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
    PerceptualVGG19,
)
from behavior_driven_video_synthesis_tpu.models.vunet import VUNet
from behavior_driven_video_synthesis_tpu.train.vunet_exp import (
    create_vunet_state,
    make_cvbae_train_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--spatial", type=int, default=256)
    ap.add_argument("--dropout", type=float, default=0.05)
    ap.add_argument("--dropout-rng", default="rbg")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    B, S = args.batch, args.spatial

    config = Config({
        "architecture": {"cvae": False},
        "training": {"ll_weight": 1.0, "vgg_weights": [1.0] * 6,
                     "train_regressor": False, "gamma_step": 1e-5,
                     "information_max": 1000.0, "n_init_batches": 4,
                     "dropout_rng": args.dropout_rng},
    })
    vunet = VUNet(spatial_size=S, nf_start=32, nf_max=128, variant="alter",
                  dropout_prob=args.dropout, dtype=jnp.bfloat16)
    vgg = PerceptualVGG19(dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    batch = {
        "app_img": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "pose_img": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "stickman": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
    }
    vgg_vars = vgg.init(key, batch["pose_img"][:1])
    txs = {"vunet": optax.adam(5e-4, b1=0.5, b2=0.9)}
    state = create_vunet_state(key, vunet, None, vgg, txs, batch)
    step = jax.jit(make_cvbae_train_step(vunet, None, vgg, vgg_vars, txs,
                                         config), donate_argnums=(0,))

    state, m = step(state, batch, key)
    float(m["loss"])
    t0 = time.perf_counter()
    runs = 5
    for r in range(runs):
        state, m = step(state, batch, jax.random.fold_in(key, r))
        float(m["loss"])
    wall_ms = (time.perf_counter() - t0) / runs * 1e3
    print(f"step {wall_ms:.1f} ms wall ({B / wall_ms * 1e3:.1f} img/s)",
          flush=True)

    tdir = "/tmp/cvbae_step_trace"
    with trace(tdir):
        for r in range(2):
            state, m = step(state, batch, jax.random.fold_in(key, 10 + r))
            float(m["loss"])
    rows = device_op_table(tdir, runs=2)
    buckets = {"conv": 0.0, "rng": 0.0, "select/mul": 0.0, "copy": 0.0,
               "other": 0.0}
    for r in rows:
        name = r["op"]
        meta = " ".join(str(v) for v in r.get("meta", {}).values())
        txt = name + " " + meta
        if "conv" in txt:
            k = "conv"
        elif "rng" in txt or "threefry" in txt or "bit-generator" in txt \
                or "random" in txt:
            k = "rng"
        elif "select" in txt or "multiply" in txt:
            k = "select/mul"
        elif name.startswith("copy") or "transpose" in name:
            k = "copy"
        else:
            k = "other"
        buckets[k] += r["us_per_run"]
    total = sum(buckets.values())
    print(json.dumps({
        "wall_ms": round(wall_ms, 1),
        "device_ms": round(total / 1e3, 1),
        "buckets_ms": {k: round(v / 1e3, 2) for k, v in buckets.items()},
    }), flush=True)
    for r in rows[:args.top]:
        print(f"  {r['us_per_run']:9.1f}us {r['share']:6.2%} {r['op'][:60]}"
              f"  {str(r['meta'])[:80]}")


if __name__ == "__main__":
    main()
