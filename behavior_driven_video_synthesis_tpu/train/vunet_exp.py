"""VUNet training steps: "cvbae" (alter, KL-to-prior) and original VUNet.

Re-designs of /root/reference/experiments/shape_and_pose_net.py:360-466 and
experiments/vunet.py:278-338 as pure jitted steps.

cvbae loss:
  ll_weight * sum(vgg_loss levels) + gamma * compute_kl_with_prior
  - w_reg * clip(L_reg, max=1.2)          [gradient-inert; see note]
  regressor: reg_steps updates predicting 2D keypoints from sg(latent means)
  gamma controller after the step.

Note on the adversarial term: in the reference the regressor's latents are
computed under no_grad (shape_and_pose_net.py:410-412), so the subtracted
clamp never reaches the vunet gradients — it only shifts the logged loss.
We reproduce that exactly (stop_gradient) rather than "fix" it.

org-vunet loss: perceptual likelihood + ramped kl_weight *
compute_kl_loss(prior_means, posterior_means), linear LR decay to 0.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..core import schedules
from ..core.rng import rbg_key
from .losses import compute_kl_loss, compute_kl_with_prior, vgg_loss
from .state import ModuleState


@struct.dataclass
class VunetTrainState:
    step: jnp.ndarray
    vunet: ModuleState
    regressor: ModuleState
    gamma: jnp.ndarray
    gan: Any = None  # GANState when the adversarial branch is enabled


def create_vunet_state(key, vunet, regressor, vgg, txs, sample_batch,
                       gamma_init: float = 0.0,
                       n_latent_scales: int = 2,
                       disc_model=None) -> VunetTrainState:
    x = sample_batch["app_img"]
    c = sample_batch["stickman"]
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    v_vars = vunet.init({"params": k1, "sample": k2, "dropout": k3}, x, c)
    means, _ = vunet.apply(v_vars, x, rngs={"sample": k2},
                           method=vunet.encode_means)
    if regressor is not None:
        r_vars = regressor.init(k4, means)
        reg_state = ModuleState.create(r_vars, txs["regressor"])
    else:
        reg_state = None
    gan_state = None
    if disc_model is not None:
        from .gan import create_gan_state

        gan_state = create_gan_state(k5, disc_model, txs["disc"],
                                     sample_batch["pose_img"])
    return VunetTrainState(
        step=jnp.zeros((), jnp.int32),
        vunet=ModuleState.create(v_vars, txs["vunet"]),
        regressor=reg_state,
        gamma=jnp.asarray(gamma_init, jnp.float32),
        gan=gan_state,
    )


def _accum_grads(grad_fn, params, tensors, k_s, k_d, accum):
    """Run `grad_fn(params, *microbatch, ks, kd)` over `accum` sequential
    microbatches (lax.scan) and average.  `tensors` are batch-leading
    arrays split on axis 0; rngs follow the fold_in(i) schedule.  Returns
    (mean_loss, combined_aux, averaged_grads) where scalar aux leaves are
    averaged and per-sample leaves are flattened back to the full batch.
    """
    bsz = tensors[0].shape[0]
    assert bsz % accum == 0, (
        f"batch {bsz} not divisible by grad_accum={accum}")
    msz = bsz // accum

    def to_micro(t):
        return t.reshape((accum, msz) + t.shape[1:])

    def micro_step(g_sum, inp):
        i = inp[-1]
        (l_i, aux_i), g_i = grad_fn(params, *inp[:-1],
                                    jax.random.fold_in(k_s, i),
                                    jax.random.fold_in(k_d, i))
        return jax.tree_util.tree_map(jnp.add, g_sum, g_i), (l_i, aux_i)

    g0 = jax.tree_util.tree_map(jnp.zeros_like, params)
    g_sum, (losses, auxs) = jax.lax.scan(
        micro_step, g0,
        tuple(to_micro(t) for t in tensors) + (jnp.arange(accum),))
    grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
    aux = jax.tree_util.tree_map(
        lambda v: jnp.mean(v) if v.ndim == 1
        else v.reshape((bsz,) + v.shape[2:]), auxs)
    return jnp.mean(losses), aux, grads


def make_cvbae_train_step(vunet, regressor, vgg, vgg_variables, txs, config,
                          disc_model=None) -> Callable:
    tr = config.training
    ll_weight = float(tr.get("ll_weight", 1.0))
    vgg_weights = list(tr.get("vgg_weights", [1.0] * 6))
    w_reg = float(tr.get("weight_regressor", 4.0))
    train_reg = bool(tr.get("train_regressor", True)) and regressor is not None
    gamma_step = float(tr.get("gamma_step", 1e-5))
    imax = float(tr.get("information_max", 1000.0))
    imax_mode = str(tr.get("imax_scaling", "none"))
    imax_total = int(tr.get("end_iteration", 150000))
    n_init_batches = int(tr.get("n_init_batches", 4))
    is_cvae = bool(config.architecture.get("cvae", False))
    # gradient accumulation: split the batch into `grad_accum` sequential
    # microbatches (lax.scan), average their grads, apply ONE optimizer
    # update.  Peak activation memory is one microbatch's backward — the
    # guaranteed HBM lever for large effective batches (vs. remat, whose
    # win is lowering-dependent; see models/vunet.py).  Exact for this
    # model: every loss term is a per-sample mean and there is no
    # batch-coupled normalization (weight-norm convs only).
    grad_accum = int(tr.get("grad_accum", 1))
    # "rbg" lowers the dropout-mask bits to the hardware rng-bit-generator;
    # "threefry" restores the jax default stream (same distribution either
    # way — see core.rng.rbg_key).
    dropout_rng = str(tr.get("dropout_rng", "rbg"))
    use_gan = disc_model is not None
    if use_gan:
        from .gan import make_gan_update

        gan_update, gan_gen_loss = make_gan_update(
            disc_model, txs["disc"],
            lambda_gp=float(tr.get("lambda_gp", 10.0)),
            use_gp=bool(tr.get("grad_pen", False)))
        gan_weight = float(tr.get("gan_weight", 1.0))

    def train_step(state: VunetTrainState, batch, key
                   ) -> Tuple[VunetTrainState, Dict[str, jnp.ndarray]]:
        target = batch["pose_img"]
        shape_img = batch["stickman"]
        app_img = batch.get("app_img", target)
        k_s, k_d, k_r = jax.random.split(key, 3)
        if dropout_rng == "rbg":
            # dropout masks via the hardware rng-bit-generator: the default
            # threefry chain measured ~30% of the whole cvbae-256 step
            # (CVBAE_RECONCILE.json; core.rng.rbg_key)
            k_d = rbg_key(k_d)

        def loss_fn(params, app_i, shape_i, target_i, ks, kd):
            out, means, logstds, ps, _ = vunet.apply(
                {"params": params}, app_i, shape_i,
                rngs={"sample": ks, "dropout": kd}, train=True,
            )
            feats_t = vgg.apply(vgg_variables, target_i)
            feats_p = vgg.apply(vgg_variables, out.astype(target_i.dtype))
            ll_dict = vgg_loss(feats_t, feats_p, vgg_weights)
            likelihood = ll_weight * sum(ll_dict.values())
            kl = compute_kl_with_prior(means, logstds)
            tuning = 1.0 if is_cvae else state.gamma
            # reference gate: iteration > n_init_batches with 1-based
            # ignite iterations (shape_and_pose_net.py:404) == our 0-based
            # step >= n_init_batches (KL joins on batch n_init_batches+1)
            loss = likelihood + jnp.where(
                state.step >= n_init_batches, tuning * kl, 0.0)
            # aux carries only what the step consumes: under grad_accum
            # every non-scalar aux leaf is stacked across microbatches by
            # the scan, so a stray full-batch tensor here (e.g. the
            # posterior means) would silently undo the accumulation's
            # memory win.
            aux = {"likelihood_loss": likelihood, "kl_loss": kl}
            if use_gan:
                g_loss = gan_gen_loss(state.gan, out.astype(target_i.dtype))
                loss = loss + gan_weight * g_loss
                aux["gen_gan_loss"] = g_loss
                aux["out"] = out
            aux.update({f"ll_{k}": v for k, v in ll_dict.items()})
            return loss, aux

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if grad_accum == 1:
            (loss, aux), grads = grad_fn(state.vunet.params, app_img,
                                         shape_img, target, k_s, k_d)
        else:
            loss, aux, grads = _accum_grads(
                grad_fn, state.vunet.params, (app_img, shape_img, target),
                k_s, k_d, grad_accum)

        new_reg = state.regressor
        loss_reg = jnp.zeros(())
        if train_reg:
            # probe regressor: keypoints from stop-gradient latent means of
            # dedicated regressor images
            reg_imgs = batch["reg_imgs"]       # (B, R, H, W, C)
            reg_targets = batch["reg_targets"]  # (B, R, K, 2)
            for i in range(reg_imgs.shape[1]):
                means_i, _ = vunet.apply(
                    {"params": jax.lax.stop_gradient(state.vunet.params)},
                    reg_imgs[:, i], rngs={"sample": jax.random.fold_in(k_r, i)},
                    method=vunet.encode_means,
                )
                means_i = jax.lax.stop_gradient(means_i)
                tgt = reg_targets[:, i].reshape(reg_targets.shape[0], -1)

                def reg_loss_fn(rp):
                    preds = regressor.apply({"params": rp}, means_i)
                    return jnp.mean(jnp.sqrt(
                        jnp.sum((preds - tgt) ** 2, axis=1) + 1e-12))

                loss_reg, rg = jax.value_and_grad(reg_loss_fn)(new_reg.params)
                new_reg = new_reg.apply_gradients(txs["regressor"], rg)
            # gradient-inert parity term (see module docstring)
            loss = loss - jnp.clip(loss_reg, max=1.2) * w_reg

        new_vunet = state.vunet.apply_gradients(txs["vunet"], grads)
        # imax_scaling target schedule (reference adjust_imax over the
        # full end_iteration span, shape_and_pose_net.py:320-339,505-508)
        imax_t = schedules.imax_schedule(state.step, imax_total, imax,
                                         imax_mode)
        new_gamma = schedules.update_gamma(state.gamma, aux["kl_loss"],
                                           imax_t, gamma_step)

        new_gan = state.gan
        gan_metrics = {}
        if use_gan:
            new_gan, gan_metrics = gan_update(
                state.gan, target,
                jax.lax.stop_gradient(aux["out"]).astype(target.dtype))
            gan_metrics = dict(gan_metrics)
            gan_metrics["gen_gan_loss"] = aux["gen_gan_loss"]

        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "likelihood_loss": aux["likelihood_loss"],
            "kl_loss": aux["kl_loss"],
            "gamma": new_gamma,
            "loss_reg": loss_reg,
        }
        metrics.update({k: v for k, v in aux.items()
                        if k.startswith("ll_")})
        metrics.update(gan_metrics)
        new_state = state.replace(step=state.step + 1, vunet=new_vunet,
                                  regressor=new_reg, gamma=new_gamma,
                                  gan=new_gan)
        return new_state, metrics

    return train_step


def make_org_vunet_train_step(vunet, vgg, vgg_variables, txs, config,
                              total_steps: int) -> Callable:
    tr = config.training
    ll_weight = float(tr.get("ll_weight", 1.0))
    vgg_weights = list(tr.get("vgg_weights", [1.0] * 6))
    grad_accum = int(tr.get("grad_accum", 1))  # see make_cvbae_train_step
    dropout_rng = str(tr.get("dropout_rng", "rbg"))

    def train_step(state: VunetTrainState, batch, key
                   ) -> Tuple[VunetTrainState, Dict[str, jnp.ndarray]]:
        app_img = batch["app_img"]
        target = batch["pose_img"]
        shape_img = batch["stickman"]
        k_s, k_d = jax.random.split(key)
        if dropout_rng == "rbg":
            k_d = rbg_key(k_d)  # see cvbae step note
        kl_weight = schedules.kl_ramp(
            state.step, total_steps,
            kl_init=float(tr.get("kl_init", 1e-6)),
            kl_max=float(tr.get("kl_max", 1.0)))

        def loss_fn(params, app_i, shape_i, target_i, ks, kd):
            out, q_means, _, p_means, _ = vunet.apply(
                {"params": params}, app_i, shape_i,
                rngs={"sample": ks, "dropout": kd}, train=True,
            )
            feats_t = vgg.apply(vgg_variables, target_i)
            feats_p = vgg.apply(vgg_variables, out.astype(target_i.dtype))
            ll_dict = vgg_loss(feats_t, feats_p, vgg_weights)
            likelihood = ll_weight * sum(ll_dict.values())
            kl = compute_kl_loss(p_means, q_means)
            loss = likelihood + kl_weight * kl
            return loss, {"likelihood_loss": likelihood, "kl_loss": kl}

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if grad_accum == 1:
            (loss, aux), grads = grad_fn(state.vunet.params, app_img,
                                         shape_img, target, k_s, k_d)
        else:
            loss, aux, grads = _accum_grads(
                grad_fn, state.vunet.params, (app_img, shape_img, target),
                k_s, k_d, grad_accum)
        new_vunet = state.vunet.apply_gradients(txs["vunet"], grads)
        metrics = {"loss": loss, "kl_weight": kl_weight,
                   "grad_norm": optax.global_norm(grads), **aux}
        return state.replace(step=state.step + 1, vunet=new_vunet), metrics

    return train_step
