"""Sequence diversity/accuracy metrics, batched jnp.

Definitions match the reference exactly
(/root/reference/lib/logging.py:2077-2101 and
experiments/behavior_net.py:1238-1254):

  * APD — mean over samples of sum of pairwise full-sequence L2 distances
          divided by (n_samples - 1)
  * ASD — mean over samples of the distance to the NEAREST OTHER sample
          (per-frame L2, time-averaged)
  * FSD — same but on the final frame only
  * ADE — mean over batch of min-over-samples time-averaged per-frame L2
          to the ground-truth future
  * FDE — same on the final frame

Shapes: samples (B, S, T, K, 3) — S rollouts per sequence; gt (B, T, K, 3).
All fully vectorized (the reference loops in python per batch element).
"""
from __future__ import annotations

import jax.numpy as jnp


def _flat_seq(x):
    # (..., T, K, 3) -> (..., T*K*3)
    return x.reshape(x.shape[:-3] + (-1,))


def _frame_norm(x):
    # (..., T, K, 3) -> (..., T): L2 over (K*3) per frame
    return jnp.sqrt(jnp.sum(x.reshape(x.shape[:-2] + (-1,)) ** 2, axis=-1))


def average_pairwise_distance(samples):
    """samples: (B, S, T, K, 3) -> scalar APD."""
    B, S = samples.shape[:2]
    diff = samples[:, :, None] - samples[:, None]  # (B, S, S, T, K, 3)
    dist = jnp.sqrt(jnp.sum(_flat_seq(diff) ** 2, axis=-1))  # (B, S, S)
    per_query = jnp.sum(dist, axis=-1) / (S - 1)  # (B, S)
    return jnp.mean(jnp.sum(per_query, axis=-1) / S)


def _nearest_other(dist):
    """dist (B, S, S) with zero diagonal -> (B, S) distance to nearest other
    (the reference's sort()[1])."""
    S = dist.shape[-1]
    eye = jnp.eye(S, dtype=bool)
    dist = jnp.where(eye, jnp.inf, dist)
    return jnp.min(dist, axis=-1)


def average_self_distance(samples):
    """samples (B, S, T, K, 3) -> scalar ASD."""
    diff = samples[:, :, None] - samples[:, None]
    per_frame = _frame_norm(diff)  # (B, S, S, T)
    dist = jnp.mean(per_frame, axis=-1)  # (B, S, S)
    return jnp.mean(_nearest_other(dist))


def final_self_distance(samples):
    """samples (B, S, T, K, 3) -> scalar FSD."""
    last = samples[:, :, -1]  # (B, S, K, 3)
    diff = last[:, :, None] - last[:, None]  # (B, S, S, K, 3)
    dist = jnp.sqrt(jnp.sum(
        diff.reshape(diff.shape[:3] + (-1,)) ** 2, axis=-1))
    return jnp.mean(_nearest_other(dist))


def average_displacement_error(samples, gt):
    """samples (B, S, T, K, 3), gt (B, T, K, 3) -> scalar ADE (min over S)."""
    diff = samples - gt[:, None]
    per_frame = _frame_norm(diff)  # (B, S, T)
    per_sample = jnp.mean(per_frame, axis=-1)  # (B, S)
    return jnp.mean(jnp.min(per_sample, axis=-1))


def final_displacement_error(samples, gt):
    diff = samples[:, :, -1] - gt[:, None, -1]  # (B, S, K, 3)
    dist = jnp.sqrt(jnp.sum(
        diff.reshape(diff.shape[:2] + (-1,)) ** 2, axis=-1))
    return jnp.mean(jnp.min(dist, axis=-1))


def sequence_sample_metrics(samples, gt):
    """All five metrics in one call (one fused XLA program)."""
    return {
        "APD": average_pairwise_distance(samples),
        "ASD": average_self_distance(samples),
        "FSD": final_self_distance(samples),
        "ADE": average_displacement_error(samples, gt),
        "FDE": final_displacement_error(samples, gt),
    }


def mse_euler_per_action(pred_expmap, gt_expmap, actions):
    """Expmap -> euler MSE per action label (reference lib/metrics.py:
    321-357 `mse_euler`): convert each joint's expmap to euler angles and
    average squared error per action subset.

    pred/gt: (N, T, 99) expmap channels; actions: (N,) int labels.
    Returns {action_id: mse}.
    """
    import numpy as np
    from ..geometry.rotations import expmap_to_rotmat, rotmat_to_euler

    def to_euler(flat):
        exps = flat[..., 3:99].reshape(flat.shape[:-1] + (32, 3))
        return np.asarray(rotmat_to_euler(expmap_to_rotmat(exps)))

    pe, ge = to_euler(np.asarray(pred_expmap)), to_euler(
        np.asarray(gt_expmap))
    out = {}
    for a in np.unique(np.asarray(actions)):
        sel = np.asarray(actions) == a
        out[int(a)] = float(np.mean((pe[sel] - ge[sel]) ** 2))
    return out
