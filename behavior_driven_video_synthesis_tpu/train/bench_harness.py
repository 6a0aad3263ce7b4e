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
                           dropout_impl="flax", upsample_transpose=False,
                           seed=0):
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
                  upsample_transpose=upsample_transpose,
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


def build_behavior_bench_step(B=64, T=50, K=48, n_actions=10, hid=1024,
                              seed=0):
    """(state, step, batch) for one behavior-cVAE train step at the
    reference production scale (config/behavior_net.yaml:26,35: batch 64,
    dim_hidden_b 1024, 50-frame windows) — the full step: net +
    adversarial regressor (5 inner updates) + 3 probe classifiers +
    gamma controller, with the experiment's optimizer stack."""
    from ..models import ResidualBehaviorNet
    from ..models.discriminators import SequenceDiscMichael
    from ..models.probes import (
        ClassifierAction,
        ClassifierActionBeta,
        RegressorFly,
    )
    from .behavior import create_behavior_state, make_behavior_train_step
    from .state import torch_adam

    config = Config({
        "architecture": {"dim_hidden_b": hid, "cvae": False},
        "training": {"recon_loss_weight": 2.5, "weight_regressor": 0.01,
                     "use_regressor": True, "gamma_step": 1e-5,
                     "information_max": 100.0},
    })
    model = ResidualBehaviorNet(n_kps=K, dim_hidden_b=hid)
    regressor = RegressorFly(n_out=K, seq_length=T)
    cls_action = ClassifierAction(n_classes=n_actions, dim=512)
    cls_action2 = SequenceDiscMichael(layers=(2, 1, 1, 1),
                                      out_dim=n_actions)
    cls_beta = ClassifierActionBeta(n_classes=n_actions)
    # the experiment's optimizer stack (experiments/behavior_net.py
    # _make_txs; reference :288-306,334) at fixed lr
    txs = {"net": torch_adam(1e-4),
           "regressor": torch_adam(1e-4),
           "cls_action": torch_adam(1e-4, weight_decay=1e-4),
           "cls_action2": torch_adam(1e-4, weight_decay=1e-5),
           "cls_beta": torch_adam(1e-3)}
    rng = np.random.RandomState(seed)
    batch = {
        "keypoints": jnp.asarray(rng.randn(B, T + 1, K), jnp.float32),
        "action": jnp.asarray(rng.randint(0, n_actions, B), jnp.int32),
    }
    state = create_behavior_state(jax.random.PRNGKey(seed), model,
                                  regressor, cls_action, cls_action2,
                                  cls_beta, txs, batch, T)
    step = make_behavior_train_step(model, regressor, cls_action,
                                    cls_action2, cls_beta, txs, config, T)
    return state, step, batch


def build_mtvae_bench_step(B=256, T=60, K=48, seed=0, dtype=None,
                           remat_cell=False):
    """(state, step, batch) for one MTVAE train step at the reference
    production scale (config/mt_vae.yaml:13,24,28: seq 60, n_cond 10,
    batch 256; model dims 1024/512).  ``dtype`` mirrors the experiment's
    training.bf16 opt-in (params stay f32 either way)."""
    from ..models.mtvae import MTVAE
    from .mtvae_exp import create_mtvae_state, make_mtvae_train_step
    from .state import torch_adam

    config = Config({"architecture": {}, "training": {}})
    model = MTVAE(n_in=K, n_cond=10, remat_cell=remat_cell,
                  dtype=jnp.float32 if dtype is None else dtype)
    tx = torch_adam(1e-4)
    rng = np.random.RandomState(seed)
    batch = {
        "keypoints": jnp.asarray(rng.randn(B, T, K), jnp.float32),
        "paired_keypoints": jnp.asarray(rng.randn(B, T, K), jnp.float32),
    }
    state = create_mtvae_state(jax.random.PRNGKey(seed), model, tx, batch)
    step = make_mtvae_train_step(model, tx, config, 100000)
    return state, step, batch, tx


def build_org_vunet_bench_step(B=8, S=256, seed=0):
    """(state, step, batch) for one org-VUNet train step at the reference
    production scale (config/vunet.yaml:24-43: DeepFashion 256px,
    inplane_normalize -> 30-channel part-stack appearance, nf 32..128,
    batch 8, 300k iters with the kl_init->kl_max ramp)."""
    from ..models.perceptual import LaplacianPyramidFeatures
    from .vunet_exp import make_org_vunet_train_step

    tr = load_config(Path(__file__).resolve().parents[2] / "configs"
                     / "vunet.yaml")["training"]
    config = Config({
        "architecture": {},
        "training": {"ll_weight": float(tr.get("ll_weight", 1.0)),
                     "vgg_weights": [1.0] * 6,
                     "kl_init": float(tr.get("kl_init", 1e-6)),
                     "kl_max": float(tr.get("kl_max", 1.0)),
                     "dropout_rng": "rbg"},
    })
    total_steps = int(tr.get("end_iteration", 300000))
    vunet = VUNet(spatial_size=S, n_channels_x=30, nf_start=32, nf_max=128,
                  variant="org", dtype=jnp.bfloat16)
    vgg = LaplacianPyramidFeatures()
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    # inplane appearance branch: 30-channel part stacks enter at the
    # box_factor-reduced resolution (S / 2**box_factor)
    sa = S // 4
    batch = {
        "app_img": jnp.asarray(rng.rand(B, sa, sa, 30) * 2 - 1,
                               jnp.float32),
        "pose_img": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "stickman": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
    }
    txs = {"vunet": optax.adam(
        optax.linear_schedule(float(tr.get("lr", 8e-4)), 0.0, total_steps))}
    state = create_vunet_state(key, vunet, None, vgg, txs, batch)
    step = make_org_vunet_train_step(vunet, vgg, vgg.init(
        key, batch["pose_img"][:1]), txs, config, total_steps)
    return state, step, batch
