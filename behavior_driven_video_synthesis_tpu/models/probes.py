"""Probe heads: the side classifiers/regressors the reference trains next to
the cVAE as continuous disentanglement checks and adversarial bottlenecks
(/root/reference/models/pose_behavior_rnn.py:6-73, 212-239).

  * Classifier          — GRU + linear (real/fake over rollouts)
  * ClassifierAction    — LSTM action classifier (returns logits + features)
  * ClassifierActionBeta— linear probe on the behavior latent
  * Regressor           — 3-layer MLP (latent -> pose)
  * RegressorFly        — the adversarial bottleneck regressor: MLP(beta)
                          concat MLP(one-hot t) -> pose of frame t
  * FCResnet            — linear residual block with non-affine LayerNorm
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.recurrent import LSTM, GRUCell

Dtype = Any


class Classifier(nn.Module):
    """GRU over the sequence; classify from the final hidden state."""

    n_classes: int
    dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, _ = x.shape
        cell = GRUCell(self.dim, dtype=self.dtype)
        h = GRUCell.zero_carry(B, self.dim, self.dtype)
        scan = nn.scan(
            lambda c, carry, xt: c(carry, xt),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        h, _ = scan(cell, h, x)
        return nn.Dense(self.n_classes, dtype=self.dtype,
                        param_dtype=jnp.float32)(h)


class ClassifierAction(nn.Module):
    """LSTM + 2-layer head; returns (logits, penultimate features)."""

    n_classes: int
    dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        _, (h_last, _) = LSTM(self.dim, dtype=self.dtype)(
            x, return_sequences=False)
        feat = nn.relu(nn.Dense(128, dtype=self.dtype,
                                param_dtype=jnp.float32)(h_last))
        logits = nn.Dense(self.n_classes, dtype=self.dtype,
                          param_dtype=jnp.float32)(feat)
        return logits, feat


class ClassifierActionBeta(nn.Module):
    """Linear probe over the behavior latent."""

    n_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, b):
        return nn.Dense(self.n_classes, dtype=self.dtype,
                        param_dtype=jnp.float32)(b)


class Regressor(nn.Module):
    """3-layer bottleneck MLP: n_dim -> n_dim/2 -> n_dim/4 -> n_out."""

    n_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.relu(nn.Dense(d // 2, dtype=self.dtype,
                             param_dtype=jnp.float32)(x))
        h = nn.relu(nn.Dense(d // 4, dtype=self.dtype,
                             param_dtype=jnp.float32)(h))
        return nn.Dense(self.n_out, dtype=self.dtype,
                        param_dtype=jnp.float32)(h)


class RegressorFly(nn.Module):
    """Adversarial bottleneck regressor: predict the pose at a random frame t
    from (mu, one_hot(t)).  Its clamped loss is *subtracted* from the cVAE
    objective (reference experiments/behavior_net.py:642-654)."""

    n_out: int
    seq_length: int = 50
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, b, t_onehot):
        d = b.shape[-1]
        h = nn.relu(nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32)(b))
        h = nn.relu(nn.Dense(d // 2, dtype=self.dtype,
                             param_dtype=jnp.float32)(h))
        h = nn.relu(nn.Dense(d // 4, dtype=self.dtype,
                             param_dtype=jnp.float32)(h))
        c = nn.relu(nn.Dense(128, dtype=self.dtype,
                             param_dtype=jnp.float32)(t_onehot))
        hc = jnp.concatenate([h, c], axis=-1)
        return nn.Dense(self.n_out, dtype=self.dtype,
                        param_dtype=jnp.float32)(hc)


class FCResnet(nn.Module):
    """Linear resblock with non-affine LayerNorm (reference :212-239)."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        half = self.out_dim // 2
        sc = nn.Dense(self.out_dim, dtype=self.dtype,
                      param_dtype=jnp.float32)(x)
        h = nn.relu(nn.Dense(half, dtype=self.dtype,
                             param_dtype=jnp.float32)(x))
        h = nn.relu(nn.Dense(half, dtype=self.dtype,
                             param_dtype=jnp.float32)(h))
        h = nn.relu(nn.Dense(self.out_dim, dtype=self.dtype,
                             param_dtype=jnp.float32)(h))
        out = h + sc
        return nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False,
                            dtype=self.dtype)(out)
