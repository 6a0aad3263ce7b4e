"""Benchmark: VUNet 256px appearance-transfer synthesis throughput.

Runs on the real TPU chip.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
2,000 256px frames/sec/chip (the reference publishes no throughput numbers —
SURVEY.md §6 — so the target is the baseline contract).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

NORTH_STAR_FPS = 2000.0


def main():
    import jax
    import jax.numpy as jnp
    from behavior_driven_video_synthesis_tpu.models.vunet import VUNet

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    spatial = int(os.environ.get("BENCH_SPATIAL", "256"))

    model = VUNet(
        spatial_size=spatial, n_channels_x=3, nf_start=32, nf_max=128,
        bottleneck_factor=2, box_factor=2, variant="alter",
        dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 2),
                          (batch, spatial, spatial, 3), jnp.float32)
    c = jax.random.normal(jax.random.fold_in(key, 3),
                          (batch, spatial, spatial, 3), jnp.float32)
    variables = model.init(
        {"params": key, "sample": jax.random.fold_in(key, 1)}, x, c
    )

    @jax.jit
    def transfer(variables, x, c, key):
        return model.apply(variables, x, c, rngs={"sample": key},
                           method=model.transfer)

    # warmup + compile
    out = transfer(variables, x, c, key)
    out.block_until_ready()

    n_iters = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = transfer(variables, x, c, jax.random.fold_in(key, i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    fps = batch * n_iters / dt
    print(json.dumps({
        "metric": f"vunet_{spatial}px_transfer_throughput",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / NORTH_STAR_FPS, 4),
    }))


if __name__ == "__main__":
    main()
