"""MADE — masked autoregressive fully-connected net.

TPU-native equivalent of the reference's MADE pair
(/root/reference/lib/modules.py:503-514 `MaskedLinear`, :517-611
`ARFullyConnectedNet`).  Dormant in the reference (only the unused
autoregressive flow path touches it) but part of its module surface.

Masks are deterministic functions of (nin, hidden_sizes, seed,
natural_ordering), so they are built once in ``setup`` as static numpy
constants — XLA folds them into the weights at compile time; there is no
mask buffer to checkpoint.  The multi-mask "connectivity ensemble" cycling
(reference update_masks :567-589) is exposed via the ``seed`` attribute:
construct the module with a different seed per ensemble member.
"""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class MaskedDense(nn.Module):
    """Dense layer with a fixed binary connectivity mask on the kernel
    (reference MaskedLinear, lib/modules.py:503-514)."""

    features: int
    mask: np.ndarray            # (in_features, features) static 0/1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mask = jnp.asarray(self.mask, kernel.dtype)
        return (x @ (kernel * mask) + bias).astype(self.dtype)


def _build_masks(nin: int, hidden_sizes: Sequence[int], nout: int,
                 seed: int, natural_ordering: bool):
    """Degree-based MADE masks (reference update_masks,
    lib/modules.py:567-589)."""
    rng = np.random.RandomState(seed)
    L = len(hidden_sizes)
    m = {-1: (np.arange(nin) if natural_ordering
              else rng.permutation(nin))}
    for layer in range(L):
        m[layer] = rng.randint(m[layer - 1].min(), nin - 1,
                               size=hidden_sizes[layer])
    masks = [(m[layer - 1][:, None] <= m[layer][None, :])
             for layer in range(L)]
    masks.append(m[L - 1][:, None] < m[-1][None, :])
    if nout > nin:
        k = nout // nin
        masks[-1] = np.concatenate([masks[-1]] * k, axis=1)
    return [mk.astype(np.float32) for mk in masks]


class ARFullyConnectedNet(nn.Module):
    """MADE MLP: output unit j depends only on inputs with degree < j.

    nout must be a multiple of nin; the k output chunks share the input
    ordering (e.g. means then stds).  With ncond > 0 a parallel masked
    conditioning trunk is added into every layer (reference forward,
    lib/modules.py:590-611)."""

    nin: int
    hidden_sizes: Sequence[int]
    nout: int
    ncond: int = 0
    natural_ordering: bool = False
    seed: int = 0
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.nout % self.nin == 0, \
            "nout must be an integer multiple of nin"
        masks = _build_masks(self.nin, list(self.hidden_sizes), self.nout,
                             self.seed, self.natural_ordering)
        sizes = list(self.hidden_sizes) + [self.nout]
        self.net = [MaskedDense(features=s, mask=mk, dtype=self.dtype)
                    for s, mk in zip(sizes, masks)]
        if self.ncond > 0:
            # the reference never assigns masks to its condnet MaskedLinears
            # (update_masks only zips over self.net, lib/modules.py:586-589),
            # so the conditioning trunk is effectively dense — reproduced.
            self.condnet = [nn.Dense(s, dtype=self.dtype) for s in sizes]

    def __call__(self, x, y=None):
        if self.ncond > 0:
            assert y is not None
            for i, layer in enumerate(self.net):
                if i > 0:
                    x = nn.relu(x)
                    y = nn.relu(y)
                y = self.condnet[i](y)
                x = layer(x) + y
            return x
        for i, layer in enumerate(self.net):
            if i > 0:
                x = nn.relu(x)
            x = layer(x)
        return x
