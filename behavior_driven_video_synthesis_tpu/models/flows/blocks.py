"""Invertible flow blocks over flat behavior latents.

Re-designs of the *active* flow path in the reference
(/root/reference/models/flow/blocks.py:276-319 `DoubleVectorCouplingBlock2`,
:531-559 `UnconditionalFlatDoubleCouplingFlowBlock2`, :692-704 `Shuffle`;
lib/modules.py:260-331 `ActNorm`): ActNorm -> double affine coupling ->
fixed random permutation, exactly invertible, with analytic log-determinants.

Design notes (TPU):
  * Latents are flat (B, C) — the reference's vestigial (B, C, 1, 1) reshape
    is dropped.
  * ActNorm's data-dependent init happens naturally at `model.init` time: the
    param initializers close over the first batch.
  * The permutation buffer lives in a separate "buffers" variable collection
    (non-trainable), threaded through apply alongside params.
  * Couplings support odd C like the reference (dim1 = ceil(C/2)).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.nn import FullyConnectedNet

Dtype = Any


class ActNorm(nn.Module):
    """Per-feature affine y = scale * (x + loc) with data-dependent init.

    loc/scale are initialized from the first batch's statistics so the
    initial output is ~N(0,1) (reference lib/modules.py:270-305).  logdet =
    sum(log|scale|) per sample (H = W = 1 for flat latents).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        xs = jax.lax.stop_gradient(x)
        loc = self.param("loc", lambda _k: -jnp.mean(xs, axis=0))
        scale = self.param(
            "scale", lambda _k: 1.0 / (jnp.std(xs, axis=0, ddof=1) + 1e-6)
        )
        if reverse:
            return x / scale - loc
        h = scale * (x + loc)
        log_abs = jnp.log(jnp.abs(scale))
        logdet = jnp.broadcast_to(jnp.sum(log_abs), (x.shape[0],))
        return h, logdet


class DoubleCoupling(nn.Module):
    """Two affine couplings with a half-swap in between; supports odd C.

    Per coupling i: split x -> (xa: dim1, xb: dim2); scale = tanh-MLP(xa);
    xb' = xb * exp(scale) + MLP_t(xa).  Before coupling 1 (forward) the
    halves are swapped so both partitions get transformed.
    """

    in_channels: int
    hidden_dim: int
    hidden_depth: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.in_channels
        dim1 = (c // 2) + (c % 2)
        dim2 = c // 2
        self._dim1, self._dim2 = dim1, dim2
        self.s = [
            FullyConnectedNet(dim=dim1, out_dim=dim2, depth=self.hidden_depth,
                              hidden_dim=self.hidden_dim, use_tanh=True,
                              dtype=self.dtype)
            for _ in range(2)
        ]
        self.t = [
            FullyConnectedNet(dim=dim1, out_dim=dim2, depth=self.hidden_depth,
                              hidden_dim=self.hidden_dim, use_tanh=False,
                              dtype=self.dtype)
            for _ in range(2)
        ]

    def _swap(self, x):
        # rotate the first dim1 channels to the back
        return jnp.concatenate([x[:, self._dim1:], x[:, :self._dim1]], axis=1)

    def _unswap(self, x):
        # exact inverse rotation.  NOTE: the reference applies the *forward*
        # rotation again on the reverse path (models/flow/blocks.py:311-319),
        # which is only correct for even C — for odd C its reverse is silently
        # wrong.  We implement the true inverse so odd dims are invertible.
        return jnp.concatenate([x[:, self._dim2:], x[:, :self._dim2]], axis=1)

    def __call__(self, x, reverse: bool = False):
        d1 = self._dim1
        if not reverse:
            logdet = jnp.zeros((x.shape[0],), x.dtype)
            for i in range(2):
                if i % 2 != 0:
                    x = self._swap(x)
                xa, xb = x[:, :d1], x[:, d1:]
                scale = self.s[i](xa)
                xb = xb * jnp.exp(scale) + self.t[i](xa)
                x = jnp.concatenate([xa, xb], axis=1)
                logdet = logdet + jnp.sum(scale, axis=-1)
            return x, logdet
        for i in reversed(range(2)):
            if i % 2 == 0:
                x = self._unswap(x)
            xa, xb = x[:, :d1], x[:, d1:]
            xb = (xb - self.t[i](xa)) * jnp.exp(-self.s[i](xa))
            x = jnp.concatenate([xa, xb], axis=1)
        return x


class Shuffle(nn.Module):
    """Fixed random channel permutation (volume preserving)."""

    in_channels: int

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        perm = self.variable(
            "buffers", "perm",
            lambda: jax.random.permutation(
                self.make_rng("params"), self.in_channels
            ),
        ).value
        if not reverse:
            return x[:, perm], jnp.zeros((x.shape[0],), x.dtype)
        inv = jnp.argsort(perm)
        return x[:, inv]


class CouplingFlowBlock(nn.Module):
    """ActNorm -> coupling -> Shuffle (one flow step).

    coupling_type: "affine" (default), "gin" or "nice" — the latter two are
    the reference's volume-preserving dormant variants."""

    in_channels: int
    hidden_dim: int
    hidden_depth: int = 2
    coupling_type: str = "affine"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm_layer = ActNorm(dtype=self.dtype)
        self.coupling = COUPLING_TYPES[self.coupling_type](
            self.in_channels, self.hidden_dim, self.hidden_depth,
            dtype=self.dtype,
        )
        self.shuffle = Shuffle(self.in_channels)

    def __call__(self, x, reverse: bool = False):
        if not reverse:
            h, logdet = self.norm_layer(x)
            h, ld = self.coupling(h)
            logdet = logdet + ld
            h, ld = self.shuffle(h)
            logdet = logdet + ld
            return h, logdet
        h = self.shuffle(x, reverse=True)
        h = self.coupling(h, reverse=True)
        h = self.norm_layer(h, reverse=True)
        return h


class UnconditionalFlow(nn.Module):
    """Stack of ``n_flows`` coupling flow blocks (the reference's
    `UnconditionalFlow2`, models/flow/blocks.py:95-128)."""

    in_channels: int
    hidden_dim: int
    hidden_depth: int = 2
    n_flows: int = 15
    coupling_type: str = "affine"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.sub_layers = [
            CouplingFlowBlock(self.in_channels, self.hidden_dim,
                              self.hidden_depth,
                              coupling_type=self.coupling_type,
                              dtype=self.dtype)
            for _ in range(self.n_flows)
        ]

    def __call__(self, x, reverse: bool = False):
        if not reverse:
            logdet = jnp.zeros((x.shape[0],), x.dtype)
            for layer in self.sub_layers:
                x, ld = layer(x)
                logdet = logdet + ld
            return x, logdet
        for layer in reversed(self.sub_layers):
            x = layer(x, reverse=True)
        return x

    def reverse(self, z):
        return self(z, reverse=True)


class GINCoupling(DoubleCoupling):
    """Volume-preserving coupling (GIN): the last scale channel is set to
    minus the sum of the others so logdet == 0 per coupling
    (reference GINDoubleVectorCouplingBlock, models/flow/blocks.py:322-360).
    Requires even C."""

    def setup(self):
        c = self.in_channels
        assert c % 2 == 0, "GIN coupling requires even channels"
        dim1 = c // 2
        self._dim1, self._dim2 = dim1, dim1
        self.s = [
            FullyConnectedNet(dim=dim1, out_dim=dim1 - 1,
                              depth=self.hidden_depth,
                              hidden_dim=self.hidden_dim, use_tanh=True,
                              dtype=self.dtype)
            for _ in range(2)
        ]
        self.t = [
            FullyConnectedNet(dim=dim1, out_dim=dim1,
                              depth=self.hidden_depth,
                              hidden_dim=self.hidden_dim, use_tanh=False,
                              dtype=self.dtype)
            for _ in range(2)
        ]

    def _scale(self, i, xa):
        s = self.s[i](xa)
        last = -jnp.sum(s, axis=-1, keepdims=True)
        return jnp.concatenate([s, last], axis=-1)

    def __call__(self, x, reverse: bool = False):
        d1 = self._dim1
        if not reverse:
            for i in range(2):
                if i % 2 != 0:
                    x = self._swap(x)
                xa, xb = x[:, :d1], x[:, d1:]
                xb = xb * jnp.exp(self._scale(i, xa)) + self.t[i](xa)
                x = jnp.concatenate([xa, xb], axis=1)
            return x, jnp.zeros((x.shape[0],), x.dtype)
        for i in reversed(range(2)):
            if i % 2 == 0:
                x = self._unswap(x)
            xa, xb = x[:, :d1], x[:, d1:]
            xb = (xb - self.t[i](xa)) * jnp.exp(-self._scale(i, xa))
            x = jnp.concatenate([xa, xb], axis=1)
        return x


class NICECoupling(DoubleCoupling):
    """Additive (volume-preserving) coupling — NICE
    (reference blocks.py:363-449)."""

    def setup(self):
        c = self.in_channels
        dim1 = (c // 2) + (c % 2)
        dim2 = c // 2
        self._dim1, self._dim2 = dim1, dim2
        self.t = [
            FullyConnectedNet(dim=dim1, out_dim=dim2,
                              depth=self.hidden_depth,
                              hidden_dim=self.hidden_dim, use_tanh=False,
                              dtype=self.dtype)
            for _ in range(2)
        ]

    def __call__(self, x, reverse: bool = False):
        d1 = self._dim1
        if not reverse:
            for i in range(2):
                if i % 2 != 0:
                    x = self._swap(x)
                xa, xb = x[:, :d1], x[:, d1:]
                x = jnp.concatenate([xa, xb + self.t[i](xa)], axis=1)
            return x, jnp.zeros((x.shape[0],), x.dtype)
        for i in reversed(range(2)):
            if i % 2 == 0:
                x = self._unswap(x)
            xa, xb = x[:, :d1], x[:, d1:]
            x = jnp.concatenate([xa, xb - self.t[i](xa)], axis=1)
        return x


COUPLING_TYPES = {
    "affine": DoubleCoupling,
    "gin": GINCoupling,
    "nice": NICECoupling,
}
