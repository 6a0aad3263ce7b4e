"""Small shared helpers (reference lib/utils.py)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def prepare_input(x):
    """Teacher-forcing split: (x[:, :-1], x[:, 1:])
    (reference lib/utils.py:914-917)."""
    return x[:, :-1], x[:, 1:]


def scale_img(x):
    """[-1, 1] -> [0, 1], clipped (reference lib/utils.py:658-668)."""
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def valid_joints(*joints) -> bool:
    j = np.stack(joints)
    return bool((j >= 0).all())
