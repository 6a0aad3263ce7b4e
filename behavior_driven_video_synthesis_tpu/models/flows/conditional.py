"""Conditional flow stack — embedding-conditioned couplings.

TPU-native equivalent of the reference's conditional flow path
(/root/reference/models/flow/blocks.py:8-56 `ConditionalFlow`, :452-492
`ConditionalDoubleVectorCouplingBlock`, :655-689
`ConditionalFlatDoubleCouplingFlowBlock`, :733-764 `IgnoreLeakyRelu` /
`InvLeakyRelu`).  The reference never instantiates these in an experiment
(dormant path), but they are part of its model surface; here they share the
flat-latent blocks of blocks.py.

Behavior notes preserved from the reference:
  * `InvLeakyRelu` contributes **zero** logdet even though |alpha| != 1 —
    that is the reference's (mathematically sloppy) choice and is kept so
    converted checkpoints score identically.
  * conditioning_option: "none" uses the raw embedding in every block;
    "parallel" passes the embedding through a per-block 1x1 conv (Dense on
    flat latents); "sequential" chains those convs block to block.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.nn import FullyConnectedNet
from .blocks import ActNorm, Shuffle

Dtype = Any


class InvLeakyRelu(nn.Module):
    """Invertible leaky ReLU: y = x * (1 if x >= 0 else alpha).

    Reference models/flow/blocks.py:749-764 — note it reports logdet = 0."""

    alpha: float = 0.9

    def __call__(self, x, reverse: bool = False):
        scaling = jnp.where(x >= 0, 1.0, self.alpha)
        if reverse:
            return x / scaling
        return x * scaling, jnp.zeros((x.shape[0],), x.dtype)


class ConditionalCoupling(nn.Module):
    """Two affine couplings whose s/t MLPs see concat(x_half, cond)
    (reference ConditionalDoubleVectorCouplingBlock, blocks.py:452-492).
    Supports odd C like the unconditional blocks."""

    in_channels: int
    cond_channels: int
    hidden_dim: int
    hidden_depth: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.in_channels
        dim1 = (c // 2) + (c % 2)
        dim2 = c // 2
        self._dim1, self._dim2 = dim1, dim2
        in_dim = dim1 + self.cond_channels
        self.s = [
            FullyConnectedNet(dim=in_dim, out_dim=dim2,
                              depth=self.hidden_depth,
                              hidden_dim=self.hidden_dim, use_tanh=True,
                              dtype=self.dtype)
            for _ in range(2)
        ]
        self.t = [
            FullyConnectedNet(dim=in_dim, out_dim=dim2,
                              depth=self.hidden_depth,
                              hidden_dim=self.hidden_dim, use_tanh=False,
                              dtype=self.dtype)
            for _ in range(2)
        ]

    def _swap(self, x):
        return jnp.concatenate([x[:, self._dim1:], x[:, :self._dim1]],
                               axis=1)

    def _unswap(self, x):
        return jnp.concatenate([x[:, self._dim2:], x[:, :self._dim2]],
                               axis=1)

    def __call__(self, x, cond, reverse: bool = False):
        d1 = self._dim1
        if not reverse:
            logdet = jnp.zeros((x.shape[0],), x.dtype)
            for i in range(2):
                if i % 2 != 0:
                    x = self._swap(x)
                xa, xb = x[:, :d1], x[:, d1:]
                h = jnp.concatenate([xa, cond], axis=1)
                scale = self.s[i](h)
                xb = xb * jnp.exp(scale) + self.t[i](h)
                x = jnp.concatenate([xa, xb], axis=1)
                logdet = logdet + jnp.sum(scale, axis=-1)
            return x, logdet
        for i in reversed(range(2)):
            if i % 2 == 0:
                x = self._unswap(x)
            xa, xb = x[:, :d1], x[:, d1:]
            h = jnp.concatenate([xa, cond], axis=1)
            xb = (xb - self.t[i](h)) * jnp.exp(-self.s[i](h))
            x = jnp.concatenate([xa, xb], axis=1)
        return x


class ConditionalFlowBlock(nn.Module):
    """ActNorm -> (inv leaky relu) -> conditional coupling -> shuffle
    (reference ConditionalFlatDoubleCouplingFlowBlock, blocks.py:655-689)."""

    in_channels: int
    cond_channels: int
    hidden_dim: int
    hidden_depth: int = 2
    activation: str = "lrelu"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm_layer = ActNorm(dtype=self.dtype)
        self.act = (InvLeakyRelu() if self.activation == "lrelu" else None)
        self.coupling = ConditionalCoupling(
            self.in_channels, self.cond_channels, self.hidden_dim,
            self.hidden_depth, dtype=self.dtype)
        self.shuffle = Shuffle(self.in_channels)

    def __call__(self, x, cond, reverse: bool = False):
        if not reverse:
            h, logdet = self.norm_layer(x)
            if self.act is not None:
                h, ld = self.act(h)
                logdet = logdet + ld
            h, ld = self.coupling(h, cond)
            logdet = logdet + ld
            h, ld = self.shuffle(h)
            logdet = logdet + ld
            return h, logdet
        h = self.shuffle(x, reverse=True)
        h = self.coupling(h, cond, reverse=True)
        if self.act is not None:
            h = self.act(h, reverse=True)
        h = self.norm_layer(h, reverse=True)
        return h


class ConditionalFlow(nn.Module):
    """Stack of embedding-conditioned flow blocks (reference
    ConditionalFlow, blocks.py:8-56)."""

    in_channels: int
    embedding_dim: int
    hidden_dim: int
    hidden_depth: int = 2
    n_flows: int = 4
    conditioning_option: str = "none"   # none | parallel | sequential
    activation: str = "lrelu"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.sub_layers = [
            ConditionalFlowBlock(self.in_channels, self.embedding_dim,
                                 self.hidden_dim, self.hidden_depth,
                                 activation=self.activation,
                                 dtype=self.dtype)
            for _ in range(self.n_flows)
        ]
        opt = self.conditioning_option.lower()
        if opt != "none":
            self.conditioning_layers = [
                nn.Dense(self.embedding_dim, dtype=self.dtype)
                for _ in range(self.n_flows)
            ]
        self._opt = opt

    def _conds(self, embedding):
        conds = []
        hcond = embedding
        for i in range(self.n_flows):
            if self._opt == "parallel":
                hcond = self.conditioning_layers[i](embedding)
            elif self._opt == "sequential":
                hcond = self.conditioning_layers[i](hcond)
            conds.append(hcond)
        return conds

    def __call__(self, x, embedding, reverse: bool = False):
        conds = self._conds(embedding)
        if not reverse:
            logdet = jnp.zeros((x.shape[0],), x.dtype)
            for layer, cond in zip(self.sub_layers, conds):
                x, ld = layer(x, cond)
                logdet = logdet + ld
            return x, logdet
        for layer, cond in zip(reversed(self.sub_layers), reversed(conds)):
            x = layer(x, cond, reverse=True)
        return x

    def reverse(self, z, embedding):
        return self(z, embedding, reverse=True)
