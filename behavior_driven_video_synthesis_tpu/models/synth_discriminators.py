"""Image-synthesis discriminators + GAN training utilities.

Equivalents of /root/reference/models/synth_discriminator.py (not wired into
any active reference experiment — SURVEY.md §2.3 — but part of the
"pose+synth discriminators" capability in BASELINE.json): PatchGAN (ref
:10-74), part-crop discriminator over VunetRNB stacks (ref :77-112), and the
pure-functional GAN update machinery (BCE disc loss, optional R1 gradient
penalty, adaptive gradient-based loss weighting) replacing the stateful
DiscTrainer (ref :115-243).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.nn import Downsample, NormConv2d, VunetRNB
from ..train.losses import bce_logits

Dtype = Any


class PatchGANDiscriminator(nn.Module):
    """70x70-receptive-field PatchGAN with instance norm."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(2, 2),
                        padding=1, use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32)(h)
            h = _instance_norm(h)
            h = nn.leaky_relu(h, 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(1, 1), padding=1,
                    use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        h = _instance_norm(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1,
                       dtype=self.dtype, param_dtype=jnp.float32)(h)


def _instance_norm(x, eps: float = 1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class PartDiscriminator(nn.Module):
    """Real/fake head over body-part crops (RNB + downsample stack)."""

    n_scales: int
    nf_in: int = 3
    max_filters: int = 256
    dropout_prob: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = NormConv2d(16, kernel_size=3, dtype=self.dtype)(x)
        nf = 16
        for _ in range(self.n_scales):
            h = VunetRNB(channels=nf, conv_layer=NormConv2d,
                         dropout_prob=self.dropout_prob,
                         dtype=self.dtype)(h, train=train)
            nf = min(2 * nf, self.max_filters)
            h = Downsample(features=nf, dtype=self.dtype)(h)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32)(h)


# -- pure GAN update helpers -------------------------------------------------

def disc_loss_with_r1(disc_apply: Callable, disc_params, real_x, fake_x,
                      lambda_gp: float = 10.0, use_gp: bool = False
                      ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """BCE discriminator loss with optional R1 penalty on real inputs
    (reference compute_grad2, synth_discriminator.py:244-256)."""
    d_real = disc_apply(disc_params, real_x)
    d_fake = disc_apply(disc_params, jax.lax.stop_gradient(fake_x))
    real_loss = bce_logits(d_real, jnp.ones_like(d_real))
    fake_loss = bce_logits(d_fake, jnp.zeros_like(d_fake))
    loss = real_loss + fake_loss
    out = {"dloss_r": real_loss, "dloss_f": fake_loss}
    if use_gp:
        def d_sum(x):
            return jnp.sum(disc_apply(disc_params, x))

        grads = jax.grad(d_sum)(real_x)
        reg = lambda_gp * jnp.mean(
            jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1))
        loss = loss + reg
        out["gp"] = reg
    out["dloss"] = loss
    return loss, out


def generator_gan_loss(disc_apply: Callable, disc_params, fake_x):
    d_fake = disc_apply(jax.lax.stop_gradient(disc_params), fake_x)
    return bce_logits(d_fake, jnp.ones_like(d_fake))


def adaptive_gan_weight(grad_normal: jnp.ndarray, grad_gan: jnp.ndarray,
                        eps: float = 1e-8) -> jnp.ndarray:
    """|mean(d pre_loss/d w_last)| / |mean(d gan_loss/d w_last)| — the
    reference's gradient-based loss weighting (ref :197-209)."""
    return jax.lax.stop_gradient(
        jnp.abs(jnp.mean(grad_normal) / (jnp.mean(grad_gan) + eps)))
