"""Behavior-cVAE training: one pure jitted step.

Re-design of the reference's impure per-batch procedure
(/root/reference/experiments/behavior_net.py:448-732), which interleaves the
cVAE update, 5 adversarial-regressor optimizer steps, and 3 probe-classifier
steps inside one batch with retain_graph.  Here it is one pure function

    (state, batch, key) -> (state, metrics)

with separate optax updates per param collection (stop_gradient replaces
detach), the adaptive-gamma controller carried in the state, and the whole
thing jit/pjit-able over a data-parallel mesh.

Loss structure (ref :615-688):
  net:   recon_w * MSE(xs, target) + gamma * KL(mu, logstd)
         - w_reg * (clip(L_reg, max=0.45) + clip(L_reg, max=0.7))
  reg:   5 inner updates of MSE(reg(sg(mu), onehot(t)), seq[:, t])
  probes: CE on action labels from (sequence | velocities | sg(mu))
  gamma: gamma <- max(gamma - gamma_step * (imax - KL), 0)

One deliberate divergence: the reference trains the regressor BEFORE taking
the net gradient (the adversarial term then sees the just-updated regressor);
we take the net gradient against the current regressor and update the
regressor afterwards, saving a full second forward — the regressor lags by
one batch, which is immaterial to the adversarial game.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..core import schedules
from .losses import (
    accuracy,
    cross_entropy,
    kl_loss,
    mse_loss,
    recon_loss_per_seq,
)
from .state import ModuleState


@struct.dataclass
class BehaviorTrainState:
    step: jnp.ndarray
    net: ModuleState
    regressor: ModuleState
    cls_action: ModuleState
    cls_action2: ModuleState
    cls_beta: ModuleState
    gamma: jnp.ndarray


def create_behavior_state(key, model, regressor, cls_action, cls_action2,
                          cls_beta, txs: Dict[str, optax.GradientTransformation],
                          sample_batch, seq_len: int,
                          gamma_init: float = 0.0) -> BehaviorTrainState:
    """Initialize all modules from a sample batch."""
    kps = sample_batch["keypoints"]
    seq_b = kps[:, :-1]
    B = seq_b.shape[0]
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    net_vars = model.init({"params": k1, "sample": k2}, seq_b, seq_b, seq_len)
    t_onehot = jax.nn.one_hot(jnp.zeros(B, jnp.int32), seq_len)
    mu0 = jnp.zeros((B, model.dim_hidden_b))
    reg_vars = regressor.init(k3, mu0, t_onehot)
    ca_vars = cls_action.init(k4, seq_b)
    ca2_vars = cls_action2.init(k5, seq_b[:, 1:] - seq_b[:, :-1])
    cb_vars = cls_beta.init(k6, mu0)
    return BehaviorTrainState(
        step=jnp.zeros((), jnp.int32),
        net=ModuleState.create(net_vars, txs["net"]),
        regressor=ModuleState.create(reg_vars, txs["regressor"]),
        cls_action=ModuleState.create(ca_vars, txs["cls_action"]),
        cls_action2=ModuleState.create(ca2_vars, txs["cls_action2"]),
        cls_beta=ModuleState.create(cb_vars, txs["cls_beta"]),
        gamma=jnp.asarray(gamma_init, jnp.float32),
    )


def make_behavior_train_step(
    model, regressor, cls_action, cls_action2, cls_beta,
    txs: Dict[str, optax.GradientTransformation],
    config,
    seq_len: int,
    total_steps: int = 0,
) -> Callable:
    """Build the jittable train step.  ``seq_len`` is static (bucketed).

    ``total_steps`` scales the ``imax_scaling`` target schedule (the
    reference's adjust_imax over (n_epochs-10)*len(loader) iterations,
    behavior_net.py:418-443); only needed when imax_scaling != none."""
    tr = config.training
    recon_w = float(tr.get("recon_loss_weight", 2.5))
    w_reg = float(tr.get("weight_regressor", 0.01))
    use_reg = bool(tr.get("use_regressor", True))
    gamma_step = float(tr.get("gamma_step", 1e-5))
    imax = float(tr.get("information_max", 100.0))
    imax_mode = str(tr.get("imax_scaling", "none"))
    is_cvae = bool(config.architecture.get("cvae", False))
    n_reg_steps = 5

    def train_step(state: BehaviorTrainState, batch, key,
                   enable_net_update=True
                   ) -> Tuple[BehaviorTrainState, Dict[str, jnp.ndarray]]:
        kps = batch["keypoints"].astype(jnp.float32)
        seq_b, target = kps[:, :-1], kps[:, 1:]
        labels = batch["action"].astype(jnp.int32)
        B = seq_b.shape[0]

        k_sample, k_t = jax.random.split(key)

        # ---- net loss + grads (adversarial term vs current regressor) ----
        t_adv = jax.random.randint(k_t, (), 0, seq_len)
        t_onehot = jax.nn.one_hot(jnp.full((B,), t_adv), seq_len)
        target_adv = jnp.take(seq_b, t_adv, axis=1)

        def net_loss_fn(net_params):
            xs, cs, b, mu, logstd, pre = model.apply(
                {"params": net_params}, seq_b, seq_b, seq_len,
                rngs={"sample": k_sample},
            )
            recon = mse_loss(xs, target)
            kl = kl_loss(mu, logstd)
            tuning = 1.0 if is_cvae else state.gamma
            loss = recon_w * recon + tuning * kl
            aux = {"recon": recon, "kl": kl, "mu": mu, "b": b, "xs": xs}
            if use_reg:
                pred = regressor.apply(
                    {"params": jax.lax.stop_gradient(state.regressor.params)},
                    mu, t_onehot,
                )
                loss_reg = mse_loss(pred, target_adv)
                loss = loss - jnp.clip(loss_reg, max=0.45) * w_reg
                loss = loss - jnp.clip(loss_reg, max=0.7) * w_reg
                aux["loss_reg_adv"] = loss_reg
            aux["loss"] = loss
            return loss, aux

        (loss, aux), net_grads = jax.value_and_grad(
            net_loss_fn, has_aux=True)(state.net.params)
        new_net = state.net.apply_gradients(txs["net"], net_grads,
                                            enabled=enable_net_update)
        mu_sg = jax.lax.stop_gradient(aux["mu"])

        # ---- gamma controller (only when the net actually stepped) --------
        # the reference's imax is set AFTER each iteration by the
        # ITERATION_COMPLETED hook (adjust_imax, behavior_net.py:784) and
        # initialized to 0 (:60) — so step s (0-based) updates gamma
        # against imax(s), with the very first step seeing 0
        imax_t = jnp.where(
            state.step == 0, 0.0,
            schedules.imax_schedule(state.step, max(total_steps, 1),
                                    imax, imax_mode))
        new_gamma = jnp.where(
            jnp.asarray(enable_net_update, bool),
            schedules.update_gamma(state.gamma, aux["kl"], imax_t,
                                   gamma_step),
            state.gamma,
        )

        # ---- adversarial regressor: n inner updates on sg(mu) -------------
        new_reg = state.regressor
        loss_reg = jnp.zeros(())
        if use_reg:
            for i in range(n_reg_steps):
                k_i = jax.random.fold_in(k_t, i + 1)
                t_i = jax.random.randint(k_i, (), 0, seq_len)
                t_oh = jax.nn.one_hot(jnp.full((B,), t_i), seq_len)
                tgt = jnp.take(seq_b, t_i, axis=1)

                def reg_loss_fn(rp):
                    pred = regressor.apply({"params": rp}, mu_sg, t_oh)
                    return mse_loss(pred, tgt)

                loss_reg, rg = jax.value_and_grad(reg_loss_fn)(new_reg.params)
                new_reg = new_reg.apply_gradients(txs["regressor"], rg)

        # ---- probe classifiers --------------------------------------------
        def ca_loss_fn(p):
            logits, _ = cls_action.apply({"params": p}, seq_b)
            return cross_entropy(logits, labels), logits

        (ca_loss, ca_logits), ca_grads = jax.value_and_grad(
            ca_loss_fn, has_aux=True)(state.cls_action.params)
        new_ca = state.cls_action.apply_gradients(txs["cls_action"], ca_grads)

        vel = seq_b[:, 1:] - seq_b[:, :-1]

        def ca2_loss_fn(p):
            logits, _ = cls_action2.apply({"params": p}, vel)
            return cross_entropy(logits, labels), logits

        (ca2_loss, ca2_logits), ca2_grads = jax.value_and_grad(
            ca2_loss_fn, has_aux=True)(state.cls_action2.params)
        new_ca2 = state.cls_action2.apply_gradients(txs["cls_action2"],
                                                    ca2_grads)

        def cb_loss_fn(p):
            logits = cls_beta.apply({"params": p}, mu_sg)
            return cross_entropy(logits, labels), logits

        (cb_loss, cb_logits), cb_grads = jax.value_and_grad(
            cb_loss_fn, has_aux=True)(state.cls_beta.params)
        new_cb = state.cls_beta.apply_gradients(txs["cls_beta"], cb_grads)

        new_state = state.replace(
            step=state.step + 1,
            net=new_net,
            regressor=new_reg,
            cls_action=new_ca,
            cls_action2=new_ca2,
            cls_beta=new_cb,
            gamma=new_gamma,
        )
        metrics = {
            "loss": aux["loss"],
            # global grad-norm of the cVAE net (the reference's wandb.watch
            # gradient telemetry, experiments/behavior_net.py:337)
            "grad_norm": optax.global_norm(net_grads),
            "loss_recon": aux["recon"],
            "kl_loss": aux["kl"],
            "gamma": new_gamma,
            "loss_regressor": loss_reg,
            "loss_classifier_action": ca_loss,
            "acc_classifier_action": accuracy(ca_logits, labels),
            "loss_classifier_action2": ca2_loss,
            "acc_classifier_action2": accuracy(ca2_logits, labels),
            "loss_classifier_action_beta": cb_loss,
            "acc_action_beta": accuracy(cb_logits, labels),
            "loss_per_seq_recon": recon_loss_per_seq(aux["xs"], target),
        }
        return new_state, metrics

    return train_step


def make_behavior_eval_step(model, seq_len: int) -> Callable:
    """Reconstruction + prior-sample rollout for eval."""

    def eval_step(net_params, batch, key):
        kps = batch["keypoints"].astype(jnp.float32)
        seq_b, target = kps[:, :-1], kps[:, 1:]
        xs, cs, b, mu, logstd, pre = model.apply(
            {"params": net_params}, seq_b, seq_b, seq_len,
            rngs={"sample": key},
        )
        recon = mse_loss(xs, target)
        return {"recon_mse": recon, "kl": kl_loss(mu, logstd)}, xs

    return eval_step
