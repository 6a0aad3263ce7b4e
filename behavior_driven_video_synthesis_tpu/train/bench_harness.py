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

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..core.config import Config
from ..models.perceptual import LaplacianPyramidFeatures, PerceptualVGG19
from ..models.vunet import VUNet, VunetRegressor, compute_n_scales
from .vunet_exp import create_vunet_state, make_cvbae_train_step


def build_cvbae_bench_step(B, S, *, dropout=0.05, regressor_on=True,
                           features="laplacian", dropout_rng="rbg",
                           dropout_impl="flax", seed=0):
    """Construct (state, step, batch) for one cvbae train step.

    features: "laplacian" (the shipped production perceptual default) or
    a jnp dtype for the random-init PerceptualVGG19 (the r3-era bench
    row and the reference's literal vgg_loss architecture).
    """
    config = Config({
        "architecture": {"cvae": False},
        "training": {"ll_weight": 1.0, "vgg_weights": [1.0] * 6,
                     "weight_regressor": 4.0,
                     "train_regressor": regressor_on,
                     "gamma_step": 1e-5, "information_max": 1000.0,
                     "n_init_batches": 4, "dropout_rng": dropout_rng},
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
    txs = {"vunet": optax.adam(5e-4, b1=0.5, b2=0.9),
           "regressor": optax.adam(5e-4)}
    state = create_vunet_state(key, vunet, regressor, vgg, txs, batch)
    step = make_cvbae_train_step(vunet, regressor, vgg, vgg_vars, txs,
                                 config)
    return state, step, batch
