"""Adversarial (GAN) branch for the VUNet synthesis training.

Realizes the "pose+synth discriminators" capability (BASELINE.json configs;
reference models/synth_discriminator.py DiscTrainer :115-243, which the
reference defines but never wires into an experiment): a PatchGAN (or
part-crop) discriminator trained against VUNet outputs, with BCE losses,
optional R1 gradient penalty, and the adaptive gradient-based generator
loss weighting — all as one pure jitted step extension.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..models.synth_discriminators import (
    PatchGANDiscriminator,
    disc_loss_with_r1,
    generator_gan_loss,
)
from .state import ModuleState


@struct.dataclass
class GANState:
    disc: ModuleState


def create_gan_state(key, disc_model, tx, sample_img) -> GANState:
    variables = disc_model.init(key, sample_img)
    return GANState(disc=ModuleState.create(variables, tx))


def make_gan_update(disc_model, tx, lambda_gp: float = 10.0,
                    use_gp: bool = False) -> Callable:
    """Returns (gan_state, real, fake) -> (new_state, gen_loss_fn_output,
    metrics).  The generator loss closure is evaluated by the caller inside
    its own grad computation."""

    def disc_apply(params, x):
        return disc_model.apply({"params": params}, x)

    def update(gan_state: GANState, real, fake
               ) -> Tuple[GANState, Dict[str, jnp.ndarray]]:
        def loss_fn(p):
            return disc_loss_with_r1(disc_apply, p, real, fake,
                                     lambda_gp=lambda_gp, use_gp=use_gp)

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            gan_state.disc.params)
        new_disc = gan_state.disc.apply_gradients(tx, grads)
        return gan_state.replace(disc=new_disc), out

    def gen_loss(gan_state: GANState, fake):
        return generator_gan_loss(disc_apply, gan_state.disc.params, fake)

    return update, gen_loss


def build_discriminator(config):
    tr = config.training
    return PatchGANDiscriminator(
        ndf=int(tr.get("disc_ndf", 64)),
        n_layers=int(tr.get("disc_layers", 3)),
        dtype=jnp.bfloat16 if bool(tr.get("bf16", True)) else jnp.float32,
    )
