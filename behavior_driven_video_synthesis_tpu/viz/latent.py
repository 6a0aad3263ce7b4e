"""Latent-space visualization helpers: slerp interpolation of behavior
latents (reference lib/utils.py:920-925 `slerp`; lib/logging.py:909-1202
`latent_interpolate`)."""
from __future__ import annotations

import numpy as np


def slerp(val: float, low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Spherical interpolation between two latent vectors."""
    low_n = low / np.linalg.norm(low)
    high_n = high / np.linalg.norm(high)
    omega = np.arccos(np.clip(np.dot(low_n, high_n), -1.0, 1.0))
    so = np.sin(omega)
    if so == 0:
        return (1.0 - val) * low + val * high
    return (np.sin((1.0 - val) * omega) / so * low
            + np.sin(val * omega) / so * high)


def latent_interpolate(b_start: np.ndarray, b_end: np.ndarray,
                       n_steps: int = 10) -> np.ndarray:
    """(H,) x 2 -> (n_steps, H) slerp path through behavior space."""
    vals = np.linspace(0.0, 1.0, n_steps)
    return np.stack([slerp(float(v), b_start, b_end) for v in vals])
