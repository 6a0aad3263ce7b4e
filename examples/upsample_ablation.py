"""Measure subpixel (conv + depth_to_space) vs transposed-conv upsample at
the pipeline's hot shapes on the real chip.

The dd decoder upsamples at (8->16, ..., 128->256); the big ones carry the
depth_to_space relayout copies (~8% of pipeline device time, profiled).
Honest feedback-loop timing: each iteration's output feeds the next
iteration's input (resized back), so XLA cannot hoist or CSE the body.

Run: python examples/upsample_ablation.py [--batch 125] [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.ops import Upsample


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=125)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    B = args.batch

    # (H_in, C_in, C_out): dd upsample shapes for the 256px alter VUNet
    shapes = [(32, 128, 128), (64, 128, 64), (128, 64, 32)]
    key = jax.random.PRNGKey(0)
    for h, cin, cout in shapes:
        x0 = jax.random.normal(key, (B, h, h, cin), jnp.bfloat16)
        results = {}
        for name, transpose in (("subpixel", False), ("transpose", True)):
            up = Upsample(features=cout, subpixel=True, transpose=transpose,
                          dtype=jnp.bfloat16)
            p = up.init(jax.random.PRNGKey(1), x0)

            def body(i, x):
                y = up.apply(p, x)  # (B, 2h, 2h, cout)
                # feed back: down-pool and tile channels to (B, h, h, cin)
                y = y.reshape(B, h, 2, h, 2, cout).mean(axis=(2, 4))
                reps = (cin + cout - 1) // cout
                y = jnp.tile(y, (1, 1, 1, reps))[..., :cin]
                return y + x0 * 1e-3

            fn = jax.jit(lambda x: jnp.sum(
                jax.lax.fori_loop(0, args.iters, body, x)
                .astype(jnp.float32)))
            float(fn(x0))  # compile + warm
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                float(fn(x0))
                ts.append(time.perf_counter() - t0)
            us = min(ts) / args.iters * 1e6
            results[name] = us
            print(f"{h}^2 x{cin}->{cout}  {name:9s}: {us:8.0f} us/op")
        print(f"  -> transpose/subpixel = "
              f"{results['transpose'] / results['subpixel']:.3f}x time")


if __name__ == "__main__":
    main()
