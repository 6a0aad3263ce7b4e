"""Schedule controllers, expressed as pure functions so jitted train steps can
carry them as state.

Reference behaviors reproduced:
  * ``linear_var`` — the universal linear ramp with clipping
    (reference lib/utils.py:520-527).
  * adaptive information-bottleneck gamma controller
    ``gamma <- max(gamma - gamma_step * (imax - kl), 0)``
    (reference experiments/behavior_net.py:110-115 and
    shape_and_pose_net.py:442).
  * MultiStep LR decay at fractions ``tau`` of total epochs with factor
    ``gamma`` (reference experiments/behavior_net.py:330-343,
    config/behavior_net.yaml:35-48).
  * linear LR decay to zero over the second half of training
    (reference experiments/vunet.py:248-256).
  * linearly ramped KL weight between total/2 and 3*total/4
    (reference experiments/vunet.py:258-266).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def linear_var(act_it, start_it, end_it, start_val, end_val, clip_min, clip_max):
    """Linear interpolation between (start_it, start_val) and (end_it, end_val),
    clipped to [clip_min, clip_max].  Works on python scalars and jnp arrays."""
    slope = (end_val - start_val) / float(end_it - start_it)
    val = slope * (act_it - start_it) + start_val
    return jnp.clip(val, clip_min, clip_max)


def update_gamma(gamma, avg_kl, imax, gamma_step):
    """One step of the adaptive information-bottleneck controller.

    Pure: returns the new gamma.  The controller raises the KL weight while
    KL > imax and lowers it (down to 0) while KL < imax.
    """
    new_gamma = gamma - gamma_step * (imax - avg_kl)
    return jnp.maximum(new_gamma, 0.0)


def imax_schedule(step, total_steps, information_max, mode: str = "none"):
    """The reference's ``imax_scaling`` target schedule (adjust_imax,
    experiments/behavior_net.py:405-443 / shape_and_pose_net.py:320-339):
    linear_var over the FULL ``total_steps``.

    ``mode``: "none" keeps it constant; "ascend" ramps 0 -> imax (the
    beta-VAE style warm-up); "descend" ramps imax -> 0.
    """
    if mode == "none":
        return jnp.asarray(information_max, jnp.float32)
    if mode == "ascend":
        return linear_var(step, 0, total_steps, 0.0, information_max,
                          0.0, information_max)
    if mode == "descend":
        return linear_var(step, 0, total_steps, information_max, 0.0,
                          0.0, information_max)
    raise ValueError(f"unknown imax_scaling mode: {mode}")


def multistep_lr(lr_init: float, n_steps: int, tau: Sequence[float],
                 gamma: float) -> optax.Schedule:
    """MultiStepLR: multiply by ``gamma`` at each fraction in ``tau``."""
    boundaries = {int(t * n_steps): gamma for t in tau}
    return optax.piecewise_constant_schedule(lr_init, boundaries)


def linear_decay_lr(lr_init: float, start_it: int, end_it: int) -> optax.Schedule:
    """Constant until ``start_it`` then linear decay to 0 at ``end_it``."""

    def schedule(step):
        return linear_var(step, start_it, end_it, lr_init, 0.0, 0.0, lr_init)

    return schedule


def kl_ramp(step, total_steps, start_frac=0.5, end_frac=0.75,
            kl_init=1e-6, kl_max=1.0):
    """KL-weight ramp used by the original-VUNet experiment: linear from
    ``kl_init`` to ``kl_max`` between total/2 and 3·total/4, clipped to
    [kl_init, 1.0] (reference adjust_kl_weight, experiments/vunet.py:
    258-266; bounds from config training.kl_init/kl_max)."""
    return linear_var(step, int(start_frac * total_steps),
                      int(end_frac * total_steps), kl_init, kl_max,
                      kl_init, 1.0)
