"""Quantify the int8 serving path's quality delta at production size.

Runs the production VUNet-256 (nf 32..128, alter) transfer on the same
inputs in three precisions — f32 (reference), bf16 (the training/serving
default), int8 (ops/nn._conv_int8 dynamic quantization) — with IDENTICAL
f32 params, and reports each path's deviation from the f32 output:
relative L2 error, PSNR, and SSIM.  The int8 path is an honest serving
option only if its deviation is comparable to bf16's, which is already the
accepted serving precision.

Inputs and weights (the part that decides whether the figures mean
anything for a user of `bdvs-generate --quant`):

  * default: smooth synthetic images + RANDOM-INIT params — characterizes
    conv-stack numerics only;
  * --train_steps N (the production measurement, VERDICT r2 weak #2):
    first trains this exact VUNet on the synthetic image dataset under the
    production cvbae config (laplacian likelihood, live gamma controller),
    then measures the quant deltas on TEST-set dataset images with the
    TRAINED params — so PTQ calibration sees trained activation
    distributions, which is what int8_static serving actually quantizes;
  * --ckpt DIR: same, but with an externally trained orbax checkpoint.

Run: python examples/quant_ablation.py [--size 256] [--train_steps 2000]
Writes QUANT_ABLATION.json at the repo root.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp


def _smooth_images(rng, b, s, scale=0.8):
    """Band-limited random images in [-1, 1] (natural-image-like spectra)."""
    small = rng.randn(b, s // 8, s // 8, 3).astype(np.float32)
    img = jax.image.resize(jnp.asarray(small), (b, s, s, 3), "bilinear")
    return jnp.tanh(img * scale)


def _train_on_synthetic(vunet, variables, size, steps, batch, n_eval):
    """Train `vunet` (bf16 compute) on the synthetic image dataset under
    the production cvbae config (laplacian likelihood — the WEIGHTS.md
    default — live gamma controller), then return (trained variables,
    test app images, test stickmen) for the quant measurement.

    Mirrors examples/perceptual_ablation.py: device-resident dataset,
    on-device batch sampling, CHUNKED dispatches (the TPU relay kills
    single executions that run for minutes)."""
    import optax
    from behavior_driven_video_synthesis_tpu.core import Config
    from behavior_driven_video_synthesis_tpu.data.synthetic_images import (
        SyntheticImageDataset,
    )
    from behavior_driven_video_synthesis_tpu.models.perceptual import (
        LaplacianPyramidFeatures,
    )
    from behavior_driven_video_synthesis_tpu.train.vunet_exp import (
        create_vunet_state,
        make_cvbae_train_step,
    )

    config = Config({
        "architecture": {"cvae": False},
        "training": {"ll_weight": 1.0, "vgg_weights": [1.0] * 6,
                     "train_regressor": False, "gamma_step": 1e-5,
                     "information_max": 1000.0, "n_init_batches": 4},
    })
    feat = LaplacianPyramidFeatures()
    key = jax.random.PRNGKey(11)
    train_ds = SyntheticImageDataset(n_persons=8, frames_per_person=16,
                                     spatial_size=size, seed=0)
    test_ds = SyntheticImageDataset(n_persons=8, frames_per_person=16,
                                    spatial_size=size, seed=1)

    def dev(ds):
        items = [ds[i] for i in range(len(ds))]
        return {k: jnp.asarray(np.stack([it[k] for it in items]))
                for k in ("pose_img", "stickman", "app_img")}

    train_data = dev(train_ds)
    fvars = feat.init(key, jnp.zeros((1, size, size, 3)))
    txs = {"vunet": optax.adam(5e-4, b1=0.5, b2=0.9)}
    b0 = {k: v[:batch] for k, v in train_data.items()}
    state = create_vunet_state(key, vunet, None, feat, txs, b0)
    state = state.replace(vunet=state.vunet.replace(
        params=variables["params"]))
    step_fn = jax.jit(make_cvbae_train_step(vunet, None, feat, fvars, txs,
                                            config),
                      donate_argnums=(0,))
    n_data = train_data["pose_img"].shape[0]
    chunk = min(steps, 250)

    # NOTE: the dataset is an ARGUMENT, not a closure — closed-over device
    # arrays are embedded as HLO constants, and at 256px the ~100 MB
    # serialized program blows the TPU relay's remote-compile request
    # limit (HTTP 413)
    @jax.jit
    def train_loop(state, data, key, start):
        def body(i, carry):
            st, _ = carry
            kb = jax.random.fold_in(key, start + i)
            idx = jax.random.randint(kb, (batch,), 0, n_data)
            b = {k: data[k][idx] for k in data}
            st, metrics = step_fn(st, b, jax.random.fold_in(kb, 1))
            return st, metrics["loss"]

        return jax.lax.fori_loop(0, chunk, body, (state, jnp.zeros(())))

    import time
    t0 = time.time()
    kl = jax.random.fold_in(key, 123)
    last = None
    for start in range(0, steps, chunk):
        state, last = jax.block_until_ready(
            train_loop(state, train_data, kl, jnp.asarray(start)))
    print(f"trained {steps} steps at {size}px in {time.time() - t0:.0f}s, "
          f"final loss {float(last):.3f}", flush=True)

    test_data = dev(test_ds)
    return ({"params": jax.device_get(state.vunet.params)},
            test_data["app_img"][:n_eval].astype(jnp.float32),
            test_data["stickman"][:n_eval].astype(jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--nf-start", type=int, default=32)
    ap.add_argument("--nf-max", type=int, default=128)
    ap.add_argument("--ckpt", type=str, default=None,
                    help="optional orbax checkpoint dir with vunet params")
    ap.add_argument("--train_steps", type=int, default=0,
                    help="train the VUNet on the synthetic image dataset "
                         "for N steps first and measure on its TEST images "
                         "(production quant measurement)")
    ap.add_argument("--train_batch", type=int, default=12)
    ap.add_argument("--platform", type=str, default=None,
                    help="force a JAX platform (e.g. cpu) — the env var is "
                         "clobbered by this sandbox's sitecustomize")
    ap.add_argument("--out", type=str, default=None,
                    help="output JSON path (default: repo-root "
                         "QUANT_ABLATION.json; point elsewhere for smoke "
                         "runs so the published artifact isn't clobbered)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from behavior_driven_video_synthesis_tpu.models.vunet import VUNet
    from behavior_driven_video_synthesis_tpu.metrics.ssim import ssim

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    x = _smooth_images(rng, args.batch, args.size)
    c = _smooth_images(rng, args.batch, args.size)

    kw = dict(spatial_size=args.size, nf_start=args.nf_start,
              nf_max=args.nf_max, variant="alter")
    models = {
        "f32": VUNet(**kw, dtype=jnp.float32),
        "bf16": VUNet(**kw, dtype=jnp.bfloat16),
        "int8": VUNet(**kw, dtype=jnp.bfloat16, quant="int8"),
        "int8_static": VUNet(**kw, dtype=jnp.bfloat16,
                             quant="int8_static"),
        # the shipped serving config: static scales, top scale kept bf16
        "int8_static_hw128": VUNet(**kw, dtype=jnp.bfloat16,
                                   quant="int8_static",
                                   quant_max_hw=args.size // 2),
    }
    variables = models["f32"].init({"params": key, "sample": key}, x, c)
    if args.train_steps:
        variables, x, c = _train_on_synthetic(
            models["bf16"], variables, args.size, args.train_steps,
            args.train_batch, args.batch)
    if args.ckpt:
        import orbax.checkpoint as ocp
        tree = ocp.PyTreeCheckpointer().restore(args.ckpt)
        # accept either a bare vunet param tree or a train-state dict
        # holding one under a "vunet"/"params" key
        for k in ("vunet", "params"):
            while isinstance(tree, dict) and k in tree:
                tree = tree[k]
        variables = {"params": tree}

    rngs = {"sample": jax.random.PRNGKey(3)}
    outs = {}
    for name, m in models.items():
        v = variables
        if name.startswith("int8_static"):
            # PTQ calibration pass on the same input distribution
            _, mut = m.apply(v, x, c, rngs=rngs, mutable=["quant"],
                             method=m.transfer)
            v = {**v, **mut}
        f = jax.jit(lambda v, x, c, m=m: m.apply(v, x, c, rngs=rngs,
                                                 method=m.transfer))
        outs[name] = np.asarray(f(v, x, c), np.float32)
        print(f"{name}: output range [{outs[name].min():.3f}, "
              f"{outs[name].max():.3f}]", flush=True)

    ref = outs["f32"]
    results = {}
    for name in ("bf16", "int8", "int8_static",
                 "int8_static_hw128"):
        y = outs[name]
        rel = float(np.linalg.norm(y - ref) / np.linalg.norm(ref))
        mse = float(np.mean((y - ref) ** 2))
        # outputs are unbounded pre-tanh image params; use the observed range
        drange = float(ref.max() - ref.min())
        psnr = float(10 * np.log10(drange ** 2 / max(mse, 1e-20)))
        sv = float(np.mean(np.asarray(ssim(
            jnp.asarray(y), jnp.asarray(ref), data_range=drange))))
        results[name] = {"rel_l2_vs_f32": round(rel, 5),
                         "psnr_db_vs_f32": round(psnr, 2),
                         "ssim_vs_f32": round(sv, 5)}
        print(f"{name} vs f32: rel_l2={rel:.5f} psnr={psnr:.2f} dB "
              f"ssim={sv:.5f}", flush=True)

    out = {"size": args.size, "batch": args.batch,
           "trained_ckpt": bool(args.ckpt) or args.train_steps > 0,
           "train_steps": args.train_steps,
           "inputs": ("dataset_test_images" if args.train_steps
                      else "smooth_noise"),
           "paths": results}
    path = args.out or os.path.join(os.path.dirname(__file__), "..",
                                    "QUANT_ABLATION.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
