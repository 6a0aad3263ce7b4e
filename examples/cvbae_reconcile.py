"""Reconcile the cvbae train-throughput numbers in ONE chip run
(VERDICT r3 weak #2 / next-round item 2).

History: the round-2 B-sweep (examples/profile_train.py) recorded
110.7 img/s at B=12 and became bench.py's anchor; the round-3 bench
recorded 92.75 img/s *donated* — the rate the round-3 ROADMAP attributed
to the UNdonated path.  The two harnesses measure different step
configurations:

  profile_train.py (the 110.7 anchor): dropout OFF (VUNet default 0.0),
      f32 VGG, regressor ON (reference production config trains it).
  bench.py:        dropout 0.05 (the reference production value,
      /root/reference/config/shape_and_pose_net.yaml:52), bf16 VGG,
      regressor OFF.

This script times every arm in one process on the chip so the numbers
are finally comparable, including donated vs undonated for the bench
arm.  Writes CVBAE_RECONCILE.json.

Run: python examples/cvbae_reconcile.py [--batch 12] [--steps 10]
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

import jax
import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.train.bench_harness import (
    build_cvbae_bench_step,
)


def build(B, S, *, dropout, regressor_on, vgg_dtype, key,
          dropout_rng="threefry", dropout_impl="flax",
          upsample_transpose=False):
    # shared with bench.py and per_conv_audit.py so all three harnesses
    # measure the same program
    del key  # seed fixed inside the shared builder
    return build_cvbae_bench_step(
        B, S, dropout=dropout, regressor_on=regressor_on,
        features=vgg_dtype, dropout_rng=dropout_rng,
        dropout_impl=dropout_impl, upsample_transpose=upsample_transpose)


def time_arm(name, B, S, n_iters, *, dropout, regressor_on, vgg_dtype,
             donate, dropout_rng="threefry", dropout_impl="flax",
             upsample_transpose=False):
    key = jax.random.PRNGKey(0)
    state, step, batch = build(B, S, dropout=dropout,
                               regressor_on=regressor_on,
                               vgg_dtype=vgg_dtype, key=key,
                               dropout_rng=dropout_rng,
                               dropout_impl=dropout_impl,
                               upsample_transpose=upsample_transpose)

    # the shared protocol (core.timing.time_step_loop) so this A/B
    # harness can never drift from the bench.py row it reconciles
    from behavior_driven_video_synthesis_tpu.core.timing import (
        time_step_loop,
    )

    dt, _, _c = time_step_loop(step, state, batch, key, n_iters,
                               fetch=lambda st: jnp.sum(st.gamma),
                               donate=donate)
    ips = B * n_iters / dt
    row = {"arm": name, "img_per_s": round(ips, 2),
           "ms_per_step": round(dt / n_iters * 1e3, 2),
           "dropout": dropout, "regressor": regressor_on,
           "features": (vgg_dtype if isinstance(vgg_dtype, str)
                        else vgg_dtype.__name__),
           "donated": donate, "dropout_rng": dropout_rng,
           "dropout_impl": dropout_impl}
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--spatial", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "CVBAE_RECONCILE.json"))
    ap.add_argument("--only", default=None,
                    help="substring filter on arm names; merges results "
                         "into an existing --out by arm name")
    args = ap.parse_args()
    B, S, n = args.batch, args.spatial, args.steps

    arms = [
        # the bench.py row as recorded in BENCH_r03
        dict(name="bench_r3 (dropout, no reg, bf16 vgg) donated",
             dropout=0.05, regressor_on=False, vgg_dtype=jnp.bfloat16,
             donate=True),
        dict(name="bench_r3 undonated",
             dropout=0.05, regressor_on=False, vgg_dtype=jnp.bfloat16,
             donate=False),
        # the round-2 anchor harness (profile_train.py defaults)
        dict(name="anchor_r2 (no dropout, reg, f32 vgg) donated",
             dropout=0.0, regressor_on=True, vgg_dtype=jnp.float32,
             donate=True),
        # isolate dropout
        dict(name="bench minus dropout",
             dropout=0.0, regressor_on=False, vgg_dtype=jnp.bfloat16,
             donate=True),
        # the FULL reference production config (what bench should report):
        # dropout 0.05 + trained regressor
        dict(name="reference production (dropout + reg) donated",
             dropout=0.05, regressor_on=True, vgg_dtype=jnp.bfloat16,
             donate=True),
        # the SHIPPED production default: laplacian perceptual features
        # (configs/shape_and_pose_net.yaml perceptual: laplacian) —
        # no VGG forward in the loss at all
        dict(name="shipped production default (dropout + reg, laplacian)",
             dropout=0.05, regressor_on=True, vgg_dtype="laplacian",
             donate=True),
        # dropout masks via the hardware rng-bit-generator (the new
        # training default, training.dropout_rng=rbg): recovers most of
        # the ~30% the threefry masks cost
        dict(name="bench_r3 config + rbg dropout",
             dropout=0.05, regressor_on=False, vgg_dtype=jnp.bfloat16,
             donate=True, dropout_rng="rbg"),
        dict(name="reference production + rbg dropout",
             dropout=0.05, regressor_on=True, vgg_dtype=jnp.bfloat16,
             donate=True, dropout_rng="rbg"),
        dict(name="shipped production default + rbg dropout",
             dropout=0.05, regressor_on=True, vgg_dtype="laplacian",
             donate=True, dropout_rng="rbg"),
        # + packed 8-bit masks (ops.nn.packed_dropout, the model default):
        # 1 byte of mask bits per element instead of bernoulli's 4
        dict(name="bench_r3 config + rbg + packed dropout",
             dropout=0.05, regressor_on=False, vgg_dtype=jnp.bfloat16,
             donate=True, dropout_rng="rbg", dropout_impl="packed"),
        dict(name="reference production + rbg + packed dropout",
             dropout=0.05, regressor_on=True, vgg_dtype=jnp.bfloat16,
             donate=True, dropout_rng="rbg", dropout_impl="packed"),
        dict(name="shipped production default + rbg + packed dropout",
             dropout=0.05, regressor_on=True, vgg_dtype="laplacian",
             donate=True, dropout_rng="rbg", dropout_impl="packed"),
        # + u32-threshold masks regenerated in backward
        # (ops.nn.bits_dropout): kills the f32 _bernoulli chain AND the
        # bool-mask residual copies the step profiler attributed ~18 of
        # dropout's 27 ms/step to
        dict(name="bench_r3 config + rbg + bits dropout",
             dropout=0.05, regressor_on=False, vgg_dtype=jnp.bfloat16,
             donate=True, dropout_rng="rbg", dropout_impl="bits"),
        dict(name="reference production + rbg + bits dropout",
             dropout=0.05, regressor_on=True, vgg_dtype=jnp.bfloat16,
             donate=True, dropout_rng="rbg", dropout_impl="bits"),
        dict(name="shipped production default + rbg + bits dropout",
             dropout=0.05, regressor_on=True, vgg_dtype="laplacian",
             donate=True, dropout_rng="rbg", dropout_impl="bits"),
        # u32-threshold masks from the THREEFRY stream: rbg's
        # RngBitGenerator is a standalone HLO op that cannot live inside
        # a fusion, so every rbg mask costs a full-tensor pass; the
        # threefry chain is plain elementwise ALU that XLA can fuse into
        # the producer conv's epilogue — if it does, the mask becomes
        # ALU-only and the extra HBM pass disappears
        dict(name="bench_r3 config + threefry bits dropout",
             dropout=0.05, regressor_on=False, vgg_dtype=jnp.bfloat16,
             donate=True, dropout_rng="threefry", dropout_impl="bits"),
        dict(name="shipped production default + threefry bits dropout",
             dropout=0.05, regressor_on=True, vgg_dtype="laplacian",
             donate=True, dropout_rng="threefry", dropout_impl="bits"),
        # round-5 arms (--only r5): the Pallas fused act+dropout kernel
        # (ops/pallas/elu_dropout.py) — ELU + in-register PRNG mask +
        # backward mask regeneration in ONE elementwise kernel, the one
        # representation XLA cannot express (mask bits never touch HBM).
        # Controls re-measured in the same process for a fair A/B.
        dict(name="r5 control: shipped production default + rbg (flax)",
             dropout=0.05, regressor_on=True, vgg_dtype="laplacian",
             donate=True, dropout_rng="rbg"),
        dict(name="r5 control: shipped default minus dropout",
             dropout=0.0, regressor_on=True, vgg_dtype="laplacian",
             donate=True, dropout_rng="rbg"),
        dict(name="r5 shipped production default + pallas fused "
                  "act-dropout",
             dropout=0.05, regressor_on=True, vgg_dtype="laplacian",
             donate=True, dropout_rng="rbg", dropout_impl="pallas"),
        # r5b: subpixel-as-transposed-conv in TRAINING (param-identical;
        # skips depth_to_space relayout copies — ~11 ms/step of the
        # profile's copy bucket — but the stride-2 transposed conv
        # lowering measured 8% SLOWER e2e in SERVING, r2; training's
        # backward may tip either way)
        dict(name="r5b control: shipped production default + rbg (flax)",
             dropout=0.05, regressor_on=True, vgg_dtype="laplacian",
             donate=True, dropout_rng="rbg"),
        dict(name="r5b shipped default + transpose upsample",
             dropout=0.05, regressor_on=True, vgg_dtype="laplacian",
             donate=True, dropout_rng="rbg", upsample_transpose=True),
    ]
    rows = []
    for a in arms:
        nm = a.pop("name")
        if args.only and args.only not in nm:
            continue
        rows.append(time_arm(nm, B, S, n, **a))

    if args.only and os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
        by_name = {r["arm"]: r for r in rows}
        out["arms"] = [by_name.pop(r["arm"], r) for r in out["arms"]]
        out["arms"] += list(by_name.values())
    else:
        out = {"batch": B, "spatial": S, "steps_per_timing": n,
               "device": jax.devices()[0].device_kind, "arms": rows,
               "note": "one-process A/B to reconcile BENCH_r03 92.75 "
                       "donated vs the round-2 110.7 anchor (VERDICT r3 "
                       "weak #2)"}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
