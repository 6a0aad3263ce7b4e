"""Loss functions, pure jnp.

Equivalents of /root/reference/lib/losses.py for the active experiments:

  * kl_loss              — diag-gaussian KL to N(0,1)         (ref :283-291)
  * latent_kl /
    compute_kl_loss      — 0.5*||mu_p - mu_q||^2 between per-scale means
                           (the original-VUNet KL)            (ref :26-65)
  * compute_kl_with_prior— mean over scales of kl_loss(mu, logstd) on
                           flattened latent maps              (ref :68-78)
  * vgg_loss             — weighted L1 over perceptual features (ref :81-119)
  * gan losses (mse/vanilla/hinge), triplet, feature matching
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp


def kl_loss(mu, logstd):
    """KL(N(mu, exp(logstd)) || N(0, 1)) summed over features, batch-meaned.

    mu/logstd: (B, D) (or any (..., D))."""
    dim = mu.shape[-1]
    std = jnp.exp(logstd)
    kl = jnp.sum(-logstd + 0.5 * (std ** 2 + mu ** 2), axis=-1) - 0.5 * dim
    return jnp.mean(kl)


def latent_kl(prior_mean, posterior_mean):
    """0.5 * ||mu_p - mu_q||^2 summed over CHW, batch-meaned (NHWC maps)."""
    kl = 0.5 * (prior_mean - posterior_mean) ** 2
    return jnp.mean(jnp.sum(kl, axis=tuple(range(1, kl.ndim))))


def compute_kl_loss(prior_means: Sequence, posterior_means: Sequence):
    """Sum of per-scale mean KLs (original-VUNet objective)."""
    return sum(latent_kl(p, q) for p, q in zip(prior_means, posterior_means))


def compute_kl_with_prior(means: Sequence, logstds: Sequence):
    """Mean over scales of kl_loss on flattened latent maps (cvbae)."""
    per_scale = [
        kl_loss(m.reshape(m.shape[0], -1), l.reshape(l.shape[0], -1))
        for m, l in zip(means, logstds)
    ]
    return jnp.mean(jnp.stack(per_scale))


def vgg_loss(feats_target: Dict[str, jnp.ndarray],
             feats_pred: Dict[str, jnp.ndarray],
             loss_weights: Sequence[float],
             pixel_weights: Optional[jnp.ndarray] = None):
    """Weighted L1 between feature pyramids (incl. the raw input level).

    feats dicts are ordered {input, relu1_2, ..., relu5_2}.  When
    ``pixel_weights`` is given it weights the pixel-level term only
    (reference vgg_loss's `weights` arg)."""
    losses = {}
    for i, name in enumerate(feats_target):
        tf, pf = feats_target[name], feats_pred[name]
        if i == 0 and pixel_weights is not None:
            term = jnp.mean(pixel_weights * jnp.abs(tf - pf))
        else:
            term = jnp.mean(jnp.abs(tf - pf))
        losses[name] = loss_weights[i] * term
    return losses


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def recon_loss_per_seq(pred, target):
    """Per-sequence MSE (B,) for histogram logging."""
    return jnp.mean((pred - target) ** 2,
                    axis=tuple(range(1, pred.ndim)))


def bce_logits(pred, target):
    return jnp.mean(
        jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )


def cross_entropy(logits, labels):
    """labels: int (B,)."""
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def accuracy(logits, labels):
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


def gan_loss(pred, target, loss_type: str = "mse"):
    """'mse' (LSGAN) or 'vanilla' (BCE-with-logits)."""
    if loss_type == "mse":
        return jnp.mean((pred - target) ** 2)
    if loss_type == "vanilla":
        return bce_logits(pred, target)
    raise ValueError(loss_type)


def hinge_d_loss(pred, mode: str):
    """Hinge discriminator/generator loss (reference SequentialDiscLoss)."""
    if mode == "real":
        return jnp.mean(jax.nn.relu(1.0 - pred))
    if mode == "fake":
        return jnp.mean(jax.nn.relu(1.0 + pred))
    if mode == "gen":
        return -jnp.mean(pred)
    raise ValueError(mode)


def triplet_loss(anchor, positive, negative, margin: float = 0.2):
    dp = jnp.sum((anchor - positive) ** 2, axis=1)
    dn = jnp.sum((anchor - negative) ** 2, axis=1)
    return jnp.mean(jax.nn.relu(dp - dn + margin))


def feature_matching_loss(feats_real: Sequence, feats_fake: Sequence):
    """Mean over levels of per-level mean-L1 (reference Sequence_disc
    .fmap_loss, models/pose_discriminator.py:173-180, divides the summed
    per-level means by the level count — matching that scale keeps
    reference-tuned loss weights transferable)."""
    if len(feats_real) != len(feats_fake):
        raise ValueError(
            f"feature list length mismatch: {len(feats_real)} real vs "
            f"{len(feats_fake)} fake")
    if not feats_real:
        return jnp.zeros(())
    n = len(feats_real)
    return sum(jnp.mean(jnp.abs(fr - ff))
               for fr, ff in zip(feats_real, feats_fake)) / n


def weight_decay_loss(params) -> jnp.ndarray:
    """Sum of squared L2 norms over a param pytree."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(jnp.sum(w * w) for w in leaves)


def mi_loss_terms(disc_apply, disc_params, joint, marginal,
                  seq_len: int = 1):
    """Mutual-information discriminator terms, matching the reference's
    JSD/BCE formulation exactly (MILoss, lib/losses.py:196-273): the disc
    is trained with BCE toward joint->1 (scaled by 1/seq_len, :244-246)
    and marginal->0; the generator loss is the NEGATED unscaled sum
    (:260-272).  Returns (disc_loss, gen_loss)."""
    t_joint = disc_apply(disc_params, joint).reshape(-1)
    t_marg = disc_apply(disc_params, marginal).reshape(-1)
    bce_joint = bce_logits(t_joint, jnp.ones_like(t_joint))
    bce_marg = bce_logits(t_marg, jnp.zeros_like(t_marg))
    disc_loss = bce_joint / seq_len + bce_marg
    gen_loss = -(bce_joint + bce_marg)
    return disc_loss, gen_loss


def zoom_loss(feats_fn, target, pred, kps, out_size: int,
              loss_weights):
    """Perceptual loss on keypoint-centered crops of the prediction
    (reference zoom_loss, lib/losses.py:122-126)."""
    from ..utils.boxes import bounding_box_batch

    pred_crop = bounding_box_batch(kps, pred, out_size)
    return vgg_loss(feats_fn(target), feats_fn(pred_crop), loss_weights)
