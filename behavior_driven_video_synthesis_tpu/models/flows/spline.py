"""Rational-quadratic spline (neural spline flow) coupling.

TPU-native equivalent of the reference's vendored NSF code
(/root/reference/models/flow/nsf_flow.py:23-168 `searchsorted` /
`unconstrained_RQS` / `RQS`, from bayesiains/nsf — dormant there, part of
the model surface).  Everything is branch-free vectorized jnp (searchsorted
+ take_along_axis + where), so a single compiled kernel covers the whole
element-wise transform on TPU.

Monotone rational-quadratic splines (Durkan et al. 2019): K bins on
[-tail_bound, tail_bound], identity (linear) tails outside; forward and
inverse are exact, with analytic log-determinant.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...ops.nn import FullyConnectedNet
from .blocks import DoubleCoupling

Dtype = Any

_MIN_WIDTH = 1e-3
_MIN_HEIGHT = 1e-3
_MIN_DERIV = 1e-3


def _searchsorted(bin_locations, inputs):
    """Index of the bin containing each input (reference nsf_flow.py:23-27)."""
    return jnp.clip(
        jnp.sum((inputs[..., None] >= bin_locations).astype(jnp.int32),
                axis=-1) - 1,
        0, bin_locations.shape[-1] - 2)


def rational_quadratic_spline(inputs, unnorm_widths, unnorm_heights,
                              unnorm_derivs, inverse: bool = False,
                              tail_bound: float = 3.0):
    """Elementwise monotone RQS with linear tails.

    inputs: (..., D); unnorm_widths/heights: (..., D, K);
    unnorm_derivs: (..., D, K - 1) — boundary derivatives are pinned to 1
    so the spline meets the identity tails smoothly
    (reference unconstrained_RQS, nsf_flow.py:30-59).
    Returns (outputs, logdet_elementwise) of the input shape.
    """
    K = unnorm_widths.shape[-1]
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    # clamp so the spline math sees in-range values; tails overwrite after
    x = jnp.clip(inputs, -tail_bound, tail_bound)

    widths = nn.softmax(unnorm_widths, axis=-1)
    widths = _MIN_WIDTH + (1 - _MIN_WIDTH * K) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.concatenate(
        [jnp.zeros_like(cumwidths[..., :1]), cumwidths], axis=-1)
    cumwidths = 2 * tail_bound * cumwidths - tail_bound
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    heights = nn.softmax(unnorm_heights, axis=-1)
    heights = _MIN_HEIGHT + (1 - _MIN_HEIGHT * K) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.concatenate(
        [jnp.zeros_like(cumheights[..., :1]), cumheights], axis=-1)
    cumheights = 2 * tail_bound * cumheights - tail_bound
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    # derivatives at the K+1 knots; endpoints pinned to 1 (identity tails)
    inner = _MIN_DERIV + nn.softplus(unnorm_derivs)
    ones = jnp.ones_like(inner[..., :1])
    derivs = jnp.concatenate([ones, inner, ones], axis=-1)

    bins = _searchsorted(cumheights if inverse else cumwidths, x)[..., None]

    def take(t):
        return jnp.take_along_axis(t, bins, axis=-1)[..., 0]

    in_w = take(widths)
    in_cw = take(cumwidths[..., :-1])
    in_h = take(heights)
    in_ch = take(cumheights[..., :-1])
    d_k = take(derivs[..., :-1])
    d_k1 = take(derivs[..., 1:])
    s = in_h / in_w

    if inverse:
        dy = x - in_ch
        a = in_h * (s - d_k) + dy * (d_k1 + d_k - 2 * s)
        b = in_h * d_k - dy * (d_k1 + d_k - 2 * s)
        c = -s * dy
        disc = b ** 2 - 4 * a * c
        xi = (2 * c) / (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
        out = xi * in_w + in_cw
        denom = s + (d_k1 + d_k - 2 * s) * xi * (1 - xi)
        dnum = s ** 2 * (d_k1 * xi ** 2 + 2 * s * xi * (1 - xi)
                         + d_k * (1 - xi) ** 2)
        logdet = -(jnp.log(dnum) - 2 * jnp.log(denom))
    else:
        xi = (x - in_cw) / in_w
        denom = s + (d_k1 + d_k - 2 * s) * xi * (1 - xi)
        out = in_ch + in_h * (s * xi ** 2 + d_k * xi * (1 - xi)) / denom
        dnum = s ** 2 * (d_k1 * xi ** 2 + 2 * s * xi * (1 - xi)
                         + d_k * (1 - xi) ** 2)
        logdet = jnp.log(dnum) - 2 * jnp.log(denom)

    out = jnp.where(inside, out, inputs)
    logdet = jnp.where(inside, logdet, jnp.zeros_like(logdet))
    return out, logdet


class RQSCoupling(DoubleCoupling):
    """Double coupling whose elementwise transform is a monotone RQS
    instead of affine scale-and-shift; drop-in ``coupling_type="rqs"``
    (reference NSFCouplingFlow family, nsf_flow.py:395-470)."""

    n_bins: int = 8
    tail_bound: float = 3.0

    def setup(self):
        c = self.in_channels
        dim1 = (c // 2) + (c % 2)
        dim2 = c // 2
        self._dim1, self._dim2 = dim1, dim2
        n_params = 3 * self.n_bins - 1
        self.nets = [
            FullyConnectedNet(dim=dim1, out_dim=dim2 * n_params,
                              depth=self.hidden_depth,
                              hidden_dim=self.hidden_dim, use_tanh=False,
                              dtype=self.dtype)
            for _ in range(2)
        ]

    def _transform(self, i, xa, xb, reverse):
        p = self.nets[i](xa).reshape(xb.shape[0], self._dim2,
                                     3 * self.n_bins - 1)
        w = p[..., :self.n_bins]
        h = p[..., self.n_bins:2 * self.n_bins]
        d = p[..., 2 * self.n_bins:]
        out, logdet = rational_quadratic_spline(
            xb, w, h, d, inverse=reverse, tail_bound=self.tail_bound)
        return out, jnp.sum(logdet, axis=-1)

    def __call__(self, x, reverse: bool = False):
        d1 = self._dim1
        if not reverse:
            logdet = jnp.zeros((x.shape[0],), x.dtype)
            for i in range(2):
                if i % 2 != 0:
                    x = self._swap(x)
                xa, xb = x[:, :d1], x[:, d1:]
                xb, ld = self._transform(i, xa, xb, reverse=False)
                x = jnp.concatenate([xa, xb], axis=1)
                logdet = logdet + ld
            return x, logdet
        for i in reversed(range(2)):
            if i % 2 == 0:
                x = self._unswap(x)
            xa, xb = x[:, :d1], x[:, d1:]
            xb, _ = self._transform(i, xa, xb, reverse=True)
            x = jnp.concatenate([xa, xb], axis=1)
        return x
