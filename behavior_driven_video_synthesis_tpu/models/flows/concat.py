"""Conditional flow with a learned conditioning embedder ("concat flow").

TPU-native equivalent of the reference's conditional-embedder flow
(/root/reference/models/flow/concat_flow.py:14-124): a `ConditionalFlow`
whose conditioning signal first runs through a small learned encoder —
`DenseEmbedder` for 1x1 (label-like) conditionings, `Embedder`
(FeatureLayer stack + dense bottleneck head) for image-like conditionings.
Dormant in the reference (no experiment instantiates it) but part of its
model surface.

Differences by design (documented, not accidental):
  * NHWC / channels-last, bf16-able compute dtype.
  * The reference's `forward(reverse=True)` branch asserts False (its own
    TODO notes it double-embeds); here `reverse()` is the only reverse path.
  * `sample` takes an explicit jax.random key instead of global torch RNG.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.nn import DenseEncoderLayer, FeatureLayer
from .blocks import ActNorm
from .conditional import ConditionalFlow

Dtype = Any


class DenseEmbedder(nn.Module):
    """Maps small-scale conditionings (e.g. labels) up to the latent dim
    through a Dense/ActNorm/LeakyReLU(0.2) stack with linspace'd widths
    (reference concat_flow.py:15-36 — kernel-1 Conv2d == Dense here)."""

    in_dim: int
    up_dim: int
    depth: int = 4
    given_dims: Optional[Sequence[int]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4:  # (B,1,1,C) conditioning maps
            x = x.reshape(x.shape[0], -1)
        if self.given_dims is not None:
            assert self.given_dims[0] == self.in_dim
            assert self.given_dims[-1] == self.up_dim
            dims = list(self.given_dims)
        else:
            dims = np.linspace(self.in_dim, self.up_dim,
                               self.depth).astype(int).tolist()
        h = x
        for d in dims[1:-1]:
            h = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32)(h)
            h, _ = ActNorm(dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Dense(dims[-1], dtype=self.dtype,
                        param_dtype=jnp.float32)(h)


class Embedder(nn.Module):
    """Image-conditioning encoder: n_down FeatureLayer scales then a dense
    bottleneck head (reference concat_flow.py:39-61)."""

    in_channels: int
    emb_dim: int
    n_down: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = FeatureLayer(0, in_channels=self.in_channels,
                         dtype=self.dtype)(x)
        for scale in range(1, self.n_down):
            h = FeatureLayer(scale, dtype=self.dtype)(h)
        return DenseEncoderLayer(self.emb_dim, dtype=self.dtype)(h)


class ConditionalTransformer(nn.Module):
    """Embedder + ConditionalFlow (reference ConditionalTransformer,
    concat_flow.py:64-124).  Works on flat latents (B, C)."""

    in_channels: int
    mid_channels: int
    hidden_depth: int
    n_flows: int
    conditioning_option: str = "none"
    conditioning_spatial_size: int = 1
    conditioning_in_channels: int = 0
    embedding_channels: Optional[int] = None
    embedder_down: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        emb = (self.embedding_channels if self.embedding_channels is not None
               else self.in_channels)
        self.flow = ConditionalFlow(
            in_channels=self.in_channels, embedding_dim=emb,
            hidden_dim=self.mid_channels, hidden_depth=self.hidden_depth,
            n_flows=self.n_flows,
            conditioning_option=self.conditioning_option, dtype=self.dtype)
        if self.conditioning_spatial_size == 1:
            self.embedder = DenseEmbedder(
                self.conditioning_in_channels, emb, dtype=self.dtype)
        else:
            self.embedder = Embedder(
                self.conditioning_in_channels, emb,
                n_down=self.embedder_down, dtype=self.dtype)

    def embed(self, conditioning):
        return self.embedder(conditioning)

    def __call__(self, x, conditioning, reverse: bool = False):
        embedding = self.embed(conditioning)
        if reverse:
            return self.flow(x, embedding, reverse=True)
        return self.flow(x, embedding)

    def reverse(self, z, conditioning):
        return self(z, conditioning, reverse=True)

    def sample(self, key, shape, conditioning):
        z = jax.random.normal(key, shape, self.dtype)
        return self.reverse(z, conditioning)
