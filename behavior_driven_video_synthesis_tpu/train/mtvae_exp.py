"""MT-VAE baseline training step.

Reference /root/reference/experiments/mt_vae.py:297-339: L1 reconstruction of
the future segment + linearly ramped KL + velocity "motion" loss over the
first k_vel frames + latent cycle loss toward N(0,1) samples.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..core.schedules import linear_var
from .losses import kl_loss, l1_loss
from .state import ModuleState


@struct.dataclass
class MTVAETrainState:
    step: jnp.ndarray
    net: ModuleState


def create_mtvae_state(key, model, tx, sample_batch) -> MTVAETrainState:
    kps = sample_batch["keypoints"]
    k1, k2 = jax.random.split(key)
    variables = model.init({"params": k1, "sample": k2}, kps, kps)
    return MTVAETrainState(step=jnp.zeros((), jnp.int32),
                           net=ModuleState.create(variables, tx))


def make_mtvae_train_step(model, tx, config, total_steps: int) -> Callable:
    tr = config.training
    k_vel = int(tr.get("k_vel", 8))
    w_motion = float(tr.get("weight_motion", 10.0))
    w_cycle = float(tr.get("weight_cycle", 10.0))
    div = model.n_cond

    def train_step(state: MTVAETrainState, batch, key, enable_update=True
                   ) -> Tuple[MTVAETrainState, Dict[str, jnp.ndarray]]:
        kps = batch["keypoints"].astype(jnp.float32)
        kps_cross = batch["paired_keypoints"].astype(jnp.float32)
        k_s, k_p = jax.random.split(key)
        # ignite iterations are 1-based (reference mt_vae.py:325) — our
        # 0-based step ramps from the same point with step + 1
        kl_weight = linear_var(state.step + 1, 0, total_steps, 1e-5, 1.0,
                               0.0, 1.0)

        # reference k_vel=8 assumes >=8 predicted frames (its windows are
        # 49+); clamp for shorter (synthetic/test) sequences
        k_v = min(k_vel, kps.shape[1] - div)

        def loss_fn(params):
            out_seq, mu, logstd, out_cycle = model.apply(
                {"params": params}, kps, kps_cross, rngs={"sample": k_s})
            ps = jax.random.normal(k_p, out_cycle.shape, out_cycle.dtype)
            cycle = l1_loss(out_cycle, ps)
            rec = l1_loss(out_seq, kps[:, div:])
            kl = kl_loss(mu, logstd)
            vel_tgt = (kps[:, div:div + k_v]
                       - kps[:, div - 1:div + k_v - 1])
            vel_pred = out_seq[:, :k_v] - jnp.concatenate(
                [kps[:, div - 1][:, None], out_seq[:, :k_v - 1]], axis=1)
            motion = l1_loss(vel_tgt, vel_pred)
            loss = (rec + kl_weight * kl + w_motion * motion
                    + w_cycle * cycle)
            return loss, {"rec_loss": rec, "kl_loss": kl,
                          "motion_loss": motion, "cycle_loss": cycle}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.net.params)
        new_net = state.net.apply_gradients(tx, grads, enabled=enable_update)
        metrics = {"loss": loss, "kl_weight": kl_weight,
                   "grad_norm": optax.global_norm(grads), **aux}
        return state.replace(step=state.step + 1, net=new_net), metrics

    return train_step
