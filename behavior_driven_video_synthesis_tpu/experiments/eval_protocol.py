"""The quantitative behavior-evaluation protocol.

Equivalents of the reference's inference-time machinery:
  * per-dimension KS test of flow latents vs N(0,1)
    (lib/logging.py:2549-2562)
  * cross-transfer drift ADE_c/FDE_c + mu-consistency scores
    (experiments/behavior_net.py:1260-1299)
  * post-hoc real-vs-fake classifiers per sample source
    (prior/cross/self/flow) + start-pose regressor from mu
    (experiments/behavior_net.py:1315-1522)
  * action-classifier transfer scores: accuracy of a pretrained action
    classifier on cross-transferred rollouts + logits L2/cos distances
    (lib/logging.py:2106-2226)

All classifier training runs as jitted optax loops over cached rollouts.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
from scipy.stats import kstest

import jax
import jax.numpy as jnp
import optax

from ..models import Classifier, Regressor
from ..train.losses import bce_logits


def ks_test_flow_gaussianity(z: np.ndarray) -> float:
    """Mean over dims of KS-test p-values of flow codes vs N(0,1)."""
    z = np.asarray(z)
    ps = [kstest(z[:, d], "norm")[1] for d in range(z.shape[1])]
    return float(np.mean(ps))


def cross_transfer_metrics(seq_cross, x_source) -> Dict[str, float]:
    """ADE_c/FDE_c: drift of the cross-transferred rollout from the source
    sequence (the '3 characters' metric)."""
    seq_cross = jnp.asarray(seq_cross)
    x_source = jnp.asarray(x_source)
    ade = jnp.mean(jnp.sqrt(jnp.sum(
        (seq_cross - x_source) ** 2, axis=-1) + 1e-12))
    fde = jnp.mean(jnp.sqrt(jnp.sum(
        (seq_cross[:, -1] - x_source[:, -1]) ** 2, axis=-1) + 1e-12))
    return {"ADE_c": float(ade), "FDE_c": float(fde)}


def mu_consistency_metrics(mu, mu_re, mu_related) -> Dict[str, float]:
    """||mu - mu(re-encoded rollout)|| vs ||mu - mu(related seq)||."""
    d_re = np.linalg.norm(np.asarray(mu - mu_re), axis=1)
    d_rel = np.linalg.norm(np.asarray(mu - mu_related), axis=1)
    return {
        "recon_mu": float(d_re.mean()), "recon_mu_std": float(d_re.std()),
        "distance_mu": float(d_rel.mean()),
        "distance_mu_std": float(d_rel.std()),
    }


def train_posthoc_classifiers(key, real_seqs: np.ndarray,
                              fake_sets: Dict[str, np.ndarray],
                              mu: Optional[np.ndarray] = None,
                              start_pose: Optional[np.ndarray] = None,
                              n_iters: int = 500, batch_size: int = 64,
                              lr: float = 1e-4) -> Dict[str, float]:
    """Train one real/fake GRU classifier per fake source; report the mean
    sigmoid on fakes (low = fooled) plus the mu->start-pose regressor loss.

    The reference runs 2000 iterations per source with fresh torch
    classifiers; here each source trains with a jitted step over the cached
    arrays.
    """
    real = jnp.asarray(real_seqs, jnp.float32)
    n = real.shape[0]
    results: Dict[str, float] = {}

    for name, fakes in fake_sets.items():
        fakes = jnp.asarray(fakes, jnp.float32)
        cls = Classifier(n_classes=1)
        key, k0 = jax.random.split(key)
        params = cls.init(k0, real[:2])["params"]
        tx = optax.adam(lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, xr, xf):
            def loss_fn(p):
                pr = cls.apply({"params": p}, xr)
                pf = cls.apply({"params": p}, xf)
                return (bce_logits(pr, jnp.ones_like(pr))
                        + bce_logits(pf, jnp.zeros_like(pf)))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for i in range(n_iters):
            key, kb = jax.random.split(key)
            idx = jax.random.randint(kb, (batch_size,), 0, n)
            params, opt_state, _ = step(params, opt_state, real[idx],
                                        fakes[idx % fakes.shape[0]])

        # final: mean sigmoid on fakes (0.5 = indistinguishable)
        preds = []
        for s in range(0, fakes.shape[0], batch_size):
            logit = cls.apply({"params": params},
                              fakes[s:s + batch_size])
            preds.append(np.asarray(jax.nn.sigmoid(logit)))
        results[f"acc_{name}"] = float(np.concatenate(preds).mean())

    if mu is not None and start_pose is not None:
        mu = jnp.asarray(mu, jnp.float32)
        start = jnp.asarray(start_pose, jnp.float32)
        reg = Regressor(n_out=start.shape[-1])
        key, k0 = jax.random.split(key)
        rparams = reg.init(k0, mu[:2])["params"]
        rtx = optax.adam(lr)
        ropt = rtx.init(rparams)

        @jax.jit
        def rstep(rparams, ropt, xm, xs):
            def loss_fn(p):
                pred = reg.apply({"params": p}, xm)
                return jnp.mean(jnp.sqrt(
                    jnp.sum((pred - xs) ** 2, axis=1) + 1e-12))

            loss, grads = jax.value_and_grad(loss_fn)(rparams)
            updates, ropt = rtx.update(grads, ropt, rparams)
            return optax.apply_updates(rparams, updates), ropt, loss

        loss = jnp.zeros(())
        for i in range(n_iters):
            key, kb = jax.random.split(key)
            idx = jax.random.randint(kb, (batch_size,), 0, mu.shape[0])
            rparams, ropt, loss = rstep(rparams, ropt, mu[idx], start[idx])
        results["loss_regressor_posthoc"] = float(loss)
    return results


def action_transfer_scores(cls_apply: Callable, seq_cross, seq_source,
                           labels) -> Dict[str, float]:
    """CF scores: does a pretrained action classifier still recognize the
    source action in the cross-transferred rollout?  Plus logits L2/cos
    distances between source and transfer."""
    logits_c, _ = cls_apply(jnp.asarray(seq_cross, jnp.float32))
    logits_s, _ = cls_apply(jnp.asarray(seq_source, jnp.float32))
    labels = jnp.asarray(labels)
    acc_cross = jnp.mean(
        (jnp.argmax(logits_c, -1) == labels).astype(jnp.float32))
    l2 = jnp.mean(jnp.sqrt(jnp.sum((logits_c - logits_s) ** 2, -1) + 1e-12))
    cos = jnp.mean(jnp.sum(logits_c * logits_s, -1) / (
        jnp.linalg.norm(logits_c, axis=-1)
        * jnp.linalg.norm(logits_s, axis=-1) + 1e-8))
    return {"CF_cross": float(acc_cross), "CF_logits_l2": float(l2),
            "CF_logits_cos": float(cos)}
