"""Where the MTVAE train step's time goes (it runs at ~0.73 of its
TRAIN_FLOORS.json op floor — this attributes the other 27%).

Profiles the exact bench row program (shared harness builder) with
core.profiling.device_op_table, buckets per-fusion device self time into
matmul / elementwise / copy / other, and appends the result to
TRAIN_FLOORS.json under mtvae_train.profile.

Run on the chip: python examples/profile_mtvae_step.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))

import jax
import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.core.profiling import (
    device_op_table,
    trace,
)
from behavior_driven_video_synthesis_tpu.core.timing import time_step_loop
from behavior_driven_video_synthesis_tpu.train.bench_harness import (
    build_mtvae_bench_step,
)

N_ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def classify(rows):
    buckets = {"matmul": 0.0, "elementwise": 0.0, "copy": 0.0,
               "other": 0.0}
    detail = []
    for r in rows:
        name = r["op"]
        meta = " ".join(str(v) for v in r.get("meta", {}).values())
        if "dot" in name or "dot" in meta or "convolution" in meta:
            key = "matmul"
        elif (name.startswith("copy") or "transpose" in name
              or name.startswith("bitcast")):
            key = "copy"
        elif ("fusion" in name or "add" in name or "multiply" in name
              or "select" in name or "tanh" in name or "exp" in name):
            key = "elementwise"
        else:
            key = "other"
        buckets[key] += r["us_per_run"]
        if r["share"] > 0.01:
            detail.append({"op": name,
                           "us_per_run": round(r["us_per_run"], 1),
                           "share": round(r["share"], 4), "kind": key})
    return buckets, detail


def main():
    state, step, batch, _tx = build_mtvae_bench_step()
    key = jax.random.PRNGKey(0)
    dt, st, compiled = time_step_loop(
        step, state, batch, key, N_ITERS,
        fetch=lambda s: jnp.sum(s.step))
    print(f"step {dt / N_ITERS * 1e3:.2f} ms "
          f"({batch['keypoints'].shape[0] * N_ITERS / dt:.1f} seq/s)",
          flush=True)

    tdir = "/tmp/mtvae_trace"
    runs = 2
    with trace(tdir):
        for r in range(runs):
            st = compiled(st, batch, jax.random.fold_in(key, 10 + r))
            float(jnp.sum(st.step))
    rows = device_op_table(tdir, runs=runs)
    buckets, detail = classify(rows)
    per_step = {k: round(v / N_ITERS, 1) for k, v in buckets.items()}
    for d in detail:
        d["us_per_run"] = round(d["us_per_run"] / N_ITERS, 1)
    print(json.dumps(per_step), flush=True)

    path = os.path.join(os.path.dirname(__file__), "..",
                        "TRAIN_FLOORS.json")
    with open(path) as f:
        data = json.load(f)
    data["mtvae_train"]["profile"] = {
        "step_ms": round(dt / N_ITERS * 1e3, 2),
        "self_time_us_per_step": per_step,
        "top_ops": detail[:20],
        "note": ("device self time per step, bucketed; the gap to the "
                 "op floor is whatever is not in the matmul bucket plus "
                 "matmul inefficiency vs the isolated floor"),
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
