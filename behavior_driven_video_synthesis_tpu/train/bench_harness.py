"""Shared builder for the cvbae train-step benchmark harness.

One construction of the benched step so bench.py (the round bench row),
examples/cvbae_reconcile.py (the config<->rate A/B artifact) and
examples/per_conv_audit.py (the conv-floor envelope denominator) all
measure the SAME program — they previously carried three hand-copied
builders that had already drifted (weight_regressor present in one).

Reference workload: config/shape_and_pose_net.yaml:44-58 (256px VUNet,
batch 12, perceptual + KL + gamma controller, optional keypoint
regressor).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..core.config import Config, load_config
from ..models.perceptual import LaplacianPyramidFeatures, PerceptualVGG19
from ..models.vunet import VUNet, VunetRegressor, compute_n_scales
from .vunet_exp import create_vunet_state, make_cvbae_train_step

_SHIPPED_CONFIG = (Path(__file__).resolve().parents[2]
                   / "configs" / "shape_and_pose_net.yaml")


def shipped_training_config() -> dict:
    """The `training:` block of configs/shape_and_pose_net.yaml, read from
    the file itself so the benched program tracks the shipped production
    default by construction (config drift cannot silently desync them)."""
    return dict(load_config(_SHIPPED_CONFIG)["training"])


def build_cvbae_bench_step(B, S, *, dropout=None, regressor_on=True,
                           features="laplacian", dropout_rng="rbg",
                           dropout_impl="flax", seed=0):
    """Construct (state, step, batch) for one cvbae train step.

    features: "laplacian" (the shipped production perceptual default) or
    a jnp dtype for the random-init PerceptualVGG19 (the r3-era bench
    row and the reference's literal vgg_loss architecture).

    dropout=None means "the shipped config's dropout_prob"; pass an
    explicit float to A/B other rates (examples/cvbae_reconcile.py).
    """
    tr = shipped_training_config()
    if dropout is None:
        dropout = float(tr["dropout_prob"])
    config = Config({
        "architecture": {"cvae": False},
        "training": {"ll_weight": float(tr["ll_weight"]),
                     "vgg_weights": list(tr["vgg_weights"]),
                     "weight_regressor": float(tr["weight_regressor"]),
                     "train_regressor": regressor_on,
                     "gamma_step": float(tr["gamma_step"]),
                     "information_max": float(tr["information_max"]),
                     "n_init_batches": int(tr["n_init_batches"]),
                     "dropout_rng": dropout_rng},
    })
    vunet = VUNet(spatial_size=S, nf_start=32, nf_max=128, variant="alter",
                  dropout_prob=dropout, dropout_impl=dropout_impl,
                  dtype=jnp.bfloat16)
    if features == "laplacian":
        vgg = LaplacianPyramidFeatures()
    else:
        vgg = PerceptualVGG19(dtype=features)
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    batch = {
        "app_img": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "pose_img": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "stickman": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
    }
    if regressor_on:
        batch["reg_imgs"] = jnp.asarray(rng.rand(B, 1, S, S, 3) * 2 - 1,
                                        jnp.float32)
        batch["reg_targets"] = jnp.asarray(rng.rand(B, 1, 17, 2),
                                           jnp.float32)
        bottleneck = S // 2 ** (compute_n_scales(S, 2, 0) - 1)
        regressor = VunetRegressor(
            n_out=34,
            latent_widths=[bottleneck * 2 ** i for i in range(2)])
    else:
        regressor = None
    vgg_vars = vgg.init(key, batch["pose_img"][:1])
    # mirror experiments/shape_and_pose_net.py: linear lr decay over the
    # reference schedule + regressor Adam(1e-3)
    txs = {"vunet": optax.adam(
        optax.linear_schedule(float(tr["lr"]), 0.0,
                              int(tr.get("end_iteration", 150000))),
        b1=0.5, b2=0.9),
        "regressor": optax.adam(1e-3)}
    state = create_vunet_state(key, vunet, regressor, vgg, txs, batch)
    step = make_cvbae_train_step(vunet, regressor, vgg, vgg_vars, txs,
                                 config)
    return state, step, batch
