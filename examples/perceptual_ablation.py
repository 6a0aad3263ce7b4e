"""Measure the training consequence of each perceptual-loss substitute.

Trains the same VUNet-alter on the synthetic image dataset with three
likelihoods — plain pixel L1, random-init VGG19 features, and the
weight-free Laplacian pyramid — and reports test reconstruction SSIM after
a fixed step budget.  This quantifies what WEIGHTS.md claims about the
substitutes (the environment has no ImageNet weights; see WEIGHTS.md).

Run: python examples/perceptual_ablation.py [--steps 300] [--size 64]
Writes PERCEPTUAL_ABLATION.json at the repo root.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from behavior_driven_video_synthesis_tpu.core import Config
from behavior_driven_video_synthesis_tpu.data.synthetic_images import (
    SyntheticImageDataset,
)
from behavior_driven_video_synthesis_tpu.metrics import ssim as ssim_fn
from behavior_driven_video_synthesis_tpu.models.perceptual import (
    LaplacianPyramidFeatures,
    PerceptualVGG19,
)
from behavior_driven_video_synthesis_tpu.models.vunet import VUNet
from behavior_driven_video_synthesis_tpu.train.vunet_exp import (
    create_vunet_state,
    make_cvbae_train_step,
)


def run_mode(mode: str, steps: int, size: int, batch: int) -> dict:
    if mode == "l1_only":
        feat, weights = LaplacianPyramidFeatures(), [1.0] + [0.0] * 5
    elif mode == "random_vgg":
        feat, weights = PerceptualVGG19(), [1.0] * 6
    elif mode == "laplacian":
        feat, weights = LaplacianPyramidFeatures(), [1.0] * 6
    else:
        raise ValueError(mode)

    # gamma_step=0: the KL bottleneck stays off so the comparison isolates
    # the likelihood term (a live controller on this tiny synthetic setup
    # blows gamma*KL up to ~1e7 and swamps the perceptual differences)
    config = Config({
        "architecture": {"cvae": False},
        "training": {"ll_weight": 1.0, "vgg_weights": weights,
                     "train_regressor": False, "gamma_step": 0.0,
                     "information_max": 1000.0, "n_init_batches": 1},
    })
    train_ds = SyntheticImageDataset(n_persons=8, frames_per_person=16,
                                     spatial_size=size, seed=0)
    test_ds = SyntheticImageDataset(n_persons=8, frames_per_person=16,
                                    spatial_size=size, seed=1)

    vunet = VUNet(spatial_size=size, nf_start=16, nf_max=64,
                  variant="alter", dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    fvars = feat.init(key, jnp.zeros((1, size, size, 3)))
    txs = {"vunet": optax.adam(5e-4)}
    batches = train_ds.batches(batch, seed=2)
    b0 = {k: jnp.asarray(v) for k, v in next(batches).items()}
    state = create_vunet_state(key, vunet, None, feat, txs, b0)
    step_fn = jax.jit(make_cvbae_train_step(vunet, None, feat, fvars, txs,
                                            config), donate_argnums=(0,))

    # whole training loop in ONE jit with the dataset device-resident:
    # per-step python dispatch through the TPU relay costs 0.3-1 s each,
    # which would dominate; a fori_loop sampling batch indices on device
    # removes every host round trip
    items = [train_ds[i] for i in range(len(train_ds))]
    data = {k: jnp.asarray(np.stack([it[k] for it in items]))
            for k in ("pose_img", "stickman", "app_img")}
    n_data = len(items)

    @jax.jit
    def train_loop(state, key):
        def body(i, carry):
            state, _ = carry
            kb = jax.random.fold_in(key, i)
            idx = jax.random.randint(kb, (batch,), 0, n_data)
            b = {k: v[idx] for k, v in data.items()}
            state, metrics = step_fn(state, b, jax.random.fold_in(kb, 1))
            return state, metrics["loss"]

        return jax.lax.fori_loop(0, steps, body,
                                 (state, jnp.zeros(())))

    t0 = time.time()
    state, last_loss = train_loop(state, jax.random.fold_in(key, 123))
    loss = float(last_loss)
    train_s = time.time() - t0

    # test-set reconstruction SSIM (transfer path, posterior means)
    tb = next(test_ds.batches(16, seed=9))
    pose = jnp.asarray(tb["pose_img"])
    stick = jnp.asarray(tb["stickman"])
    app = jnp.asarray(tb["app_img"])
    recon = jax.jit(lambda p, a, s: vunet.apply(
        {"params": p}, a, s, rngs={"sample": key},
        method=vunet.transfer))(state.vunet.params, app, stick)
    to01 = lambda v: np.clip((np.asarray(v, np.float32) + 1.0) / 2.0, 0, 1)
    val = float(np.mean(np.asarray(ssim_fn(to01(recon), to01(pose)))))
    l1 = float(np.abs(np.asarray(recon, np.float32)
                      - np.asarray(pose, np.float32)).mean())
    return {"mode": mode, "ssim": round(val, 4), "recon_l1": round(l1, 4),
            "final_loss": round(loss, 3),
            "train_seconds": round(train_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    rows = []
    for mode in ("l1_only", "random_vgg", "laplacian"):
        row = run_mode(mode, args.steps, args.size, args.batch)
        print(json.dumps(row))
        rows.append(row)
    out = {"steps": args.steps, "size": args.size, "batch": args.batch,
           "results": rows}
    path = os.path.join(os.path.dirname(__file__), "..",
                        "PERCEPTUAL_ABLATION.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
