"""Compare the cvbae train step's XLA temp-buffer footprint with and
without `training.remat` (per-RNB `jax.checkpoint`).

Uses `Compiled.memory_analysis()` — the compiler's own live-buffer
accounting — so the check runs anywhere (CPU included) without executing
a step.

MEASURED (XLA:CPU, 128px B=8 bf16, laplacian perceptual): temp memory
goes UP with remat — 1155 MiB plain, 1288 (+11%) per-RNB, 1305 (+13%)
per-subnet.  On the CPU lowering the backward temp arena is dominated by
conv workspaces rather than stored activations, and remat's prevent_cse
barriers block fusions, so this lowering cannot demonstrate a win.  The
TPU lowering has no such workspaces; run this script WITHOUT --cpu (and
the B-sweep via examples/profile_train.py --remat) on the chip for the
number that decides whether to enable training.remat.

Run: python examples/remat_memory.py [--batch 8] [--spatial 128]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--spatial", type=int, default=128)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (no TPU relay needed)")
    args = ap.parse_args()
    B, S = args.batch, args.spatial

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from behavior_driven_video_synthesis_tpu.core.config import Config
    from behavior_driven_video_synthesis_tpu.models.perceptual import (
        LaplacianPyramidFeatures,
    )
    from behavior_driven_video_synthesis_tpu.models.vunet import VUNet
    from behavior_driven_video_synthesis_tpu.train.vunet_exp import (
        create_vunet_state,
        make_cvbae_train_step,
    )

    config = Config({
        "architecture": {"cvae": False},
        "training": {"ll_weight": 1.0, "train_regressor": False,
                     "gamma_step": 1e-5, "information_max": 1000.0,
                     "n_init_batches": 4},
    })
    vgg = LaplacianPyramidFeatures()
    vgg_vars = vgg.init(jax.random.PRNGKey(1), jnp.zeros((1, S, S, 3)))
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    batch = {
        "app_img": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "pose_img": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "stickman": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
    }
    txs = {"vunet": optax.adam(5e-4)}

    stats = {}
    for remat in (False, "rnb", "subnet"):
        vunet = VUNet(spatial_size=S, nf_start=32, nf_max=128,
                      variant="alter", remat=remat, dtype=jnp.bfloat16)
        state = create_vunet_state(key, vunet, None, vgg, txs, batch)
        step = make_cvbae_train_step(vunet, None, vgg, vgg_vars, txs,
                                     config)
        compiled = (jax.jit(step, donate_argnums=(0,))
                    .lower(state, batch, key).compile())
        m = compiled.memory_analysis()
        stats[remat] = m.temp_size_in_bytes
        print(f"remat={remat!s:8}  temp={m.temp_size_in_bytes / 2**20:9.1f}"
              f" MiB  args={m.argument_size_in_bytes / 2**20:.1f} MiB "
              f"(donated-aliased {m.alias_size_in_bytes / 2**20:.1f} MiB)")
    for mode in ("rnb", "subnet"):
        ratio = stats[mode] / max(stats[False], 1)
        word = "less" if ratio <= 1 else "MORE"
        print(f"remat={mode} temp ratio: {ratio:.3f} "
              f"({abs(1 - ratio) * 100:.1f}% {word} live intermediate "
              "memory)")


if __name__ == "__main__":
    main()
