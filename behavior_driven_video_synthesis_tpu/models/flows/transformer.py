"""The flow prior over behavior latents + its NLL loss.

Equivalent of the reference's `UnsupervisedTransformer2`
(/root/reference/models/flow/simple_flow.py:136-180) — the only flow the
experiments instantiate — and `FlowLoss` (lib/losses.py:294-331).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import UnconditionalFlow

Dtype = Any


class LatentFlow(nn.Module):
    """Invertible map between behavior latents b and gaussian codes z."""

    flow_in_channels: int
    flow_mid_channels: int
    flow_hidden_depth: int = 2
    n_flows: int = 15
    dtype: Dtype = jnp.float32

    def setup(self):
        self.flow = UnconditionalFlow(
            in_channels=self.flow_in_channels,
            hidden_dim=self.flow_mid_channels,
            hidden_depth=self.flow_hidden_depth,
            n_flows=self.n_flows,
            dtype=self.dtype,
        )

    def __call__(self, b, reverse: bool = False):
        """forward: b -> (z, logdet); reverse: z -> b."""
        if reverse:
            return self.flow(b, reverse=True)
        return self.flow(b)

    def reverse(self, z):
        return self.flow(z, reverse=True)

    def sample(self, key, n: int):
        z = jax.random.normal(key, (n, self.flow_in_channels), self.dtype)
        return self.flow(z, reverse=True)


def flow_loss(z, logdet):
    """NLL under the standard-normal base: mean(||z||^2 / 2) - mean(logdet).

    Matches reference `FlowLoss.forward` (lib/losses.py:294-316) which keeps
    the constant term out.
    """
    nll_z = jnp.mean(0.5 * jnp.sum(z ** 2, axis=tuple(range(1, z.ndim))))
    return nll_z - jnp.mean(logdet)


def gaussian_reference_nll(z):
    """NLL of z under N(0, 1) INCLUDING the 0.5*d*log(2*pi) constant.

    Logged-sanity-value divergence from the reference, on purpose: the
    reference's `reference_nll_loss` (lib/losses.py:294-331) is the
    constant-free 0.5*sum(z^2) of a fresh N(0,1) draw; ours is the exact
    gaussian NLL of the actual latents, so "flow matches the base" reads as
    nll_z approaching this value rather than comparing two random draws.
    Training loss (`flow_loss` above) matches the reference exactly."""
    d = np.prod(z.shape[1:])
    return jnp.mean(
        0.5 * jnp.sum(z ** 2, axis=tuple(range(1, z.ndim)))
    ) + 0.5 * d * jnp.log(2 * jnp.pi)
