"""Recurrent cells and sequence layers as `lax.scan` programs.

The reference uses torch ``nn.LSTM`` for encoders (pose_behavior_rnn.py:138)
and a python loop over ``nn.LSTMCell`` for the autoregressive decoder
(:615-621).  TPU-native design:

  * gate math identical to torch (i, f, g, o gate order; GRU's
    ``n = tanh(W_in x + b_in + r * (W_hn h + b_hn))``) so converted
    checkpoints are drop-in;
  * full-sequence `LSTM` precomputes the input projection for ALL timesteps
    in one large MXU matmul, so the scan body only does the (B,H)x(H,4H)
    recurrent matmul;
  * cells are plain linen modules usable inside `nn.scan` for the
    autoregressive decoder (carry = (h, c), both initialized from the
    behavior latent b).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _uniform_init(hidden: int):
    bound = 1.0 / jnp.sqrt(hidden)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LSTMCell(nn.Module):
    """Torch-compatible LSTM cell.

    gates = x @ W_ih^T + b_ih + h @ W_hh^T + b_hh, chunked (i, f, g, o).
    """

    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry: Tuple[jnp.ndarray, jnp.ndarray], x):
        h, c = carry
        init = _uniform_init(self.hidden)
        w_ih = self.param("w_ih", init, (x.shape[-1], 4 * self.hidden))
        w_hh = self.param("w_hh", init, (self.hidden, 4 * self.hidden))
        b_ih = self.param("b_ih", init, (4 * self.hidden,))
        b_hh = self.param("b_hh", init, (4 * self.hidden,))
        gates = (
            x.astype(self.dtype) @ w_ih.astype(self.dtype)
            + h.astype(self.dtype) @ w_hh.astype(self.dtype)
            + (b_ih + b_hh).astype(self.dtype)
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c.astype(self.dtype) + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    @staticmethod
    def zero_carry(batch: int, hidden: int, dtype=jnp.float32):
        z = jnp.zeros((batch, hidden), dtype)
        return (z, z)


class GRUCell(nn.Module):
    """Torch-compatible GRU cell (reset-before-matmul variant)."""

    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        h = carry
        init = _uniform_init(self.hidden)
        w_ih = self.param("w_ih", init, (x.shape[-1], 3 * self.hidden))
        w_hh = self.param("w_hh", init, (self.hidden, 3 * self.hidden))
        b_ih = self.param("b_ih", init, (3 * self.hidden,))
        b_hh = self.param("b_hh", init, (3 * self.hidden,))
        gi = x.astype(self.dtype) @ w_ih.astype(self.dtype) + b_ih.astype(self.dtype)
        gh = h.astype(self.dtype) @ w_hh.astype(self.dtype) + b_hh.astype(self.dtype)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h.astype(self.dtype)
        return h_new, h_new

    @staticmethod
    def zero_carry(batch: int, hidden: int, dtype=jnp.float32):
        return jnp.zeros((batch, hidden), dtype)


class LSTM(nn.Module):
    """Full-sequence LSTM over (B, T, D).

    The input projection for all T steps runs as one batched MXU matmul
    outside the scan; the scan body only contains the recurrent matmul.
    Supports per-example lengths: carries freeze once t >= length so the
    returned final state corresponds to each sequence's last valid step
    (replaces torch's packed sequences).
    """

    hidden: int
    dtype: Dtype = jnp.float32
    remat_cell: bool = False

    @nn.compact
    def __call__(self, xs, lengths: Optional[jnp.ndarray] = None,
                 initial_carry=None, *, return_sequences: bool = True,
                 static_steps: Optional[int] = None):
        """HBM-traffic-aware layouts (TPU profile, TRAIN_FLOORS.json):

        * inputs go time-major BEFORE the 4H projection, so the relayout
          copy moves (T,B,D) bytes, not the 4x larger (T,B,4H) x_proj;
        * ``return_sequences=False`` emits no per-step scan output — callers
          that only need the final state (encoders, last-hidden classifiers)
          skip the (T,B,H) dynamic-update-slice stacking in fwd AND the
          matching re-streaming in bwd.  With ``lengths`` the carry freezes
          at each row's last valid step, so ``h_fin == hs[:, -1]`` always;
        * ``static_steps=T`` takes xs of shape (B, D) fed identically at
          every step (the MT-VAE decoder pattern, reference
          pose_behavior_rnn.py:336-339 tiles dec_in over T): the input
          projection runs ONCE instead of T times, and the backward
          accumulates dx_proj as a (B, 4H) carry sum instead of stacking
          (T, B, 4H).
        """
        if static_steps is not None:
            B, D = xs.shape
            T = static_steps
        else:
            B, T, D = xs.shape
        init = _uniform_init(self.hidden)
        w_ih = self.param("w_ih", init, (D, 4 * self.hidden))
        w_hh = self.param("w_hh", init, (self.hidden, 4 * self.hidden))
        b_ih = self.param("b_ih", init, (4 * self.hidden,))
        b_hh = self.param("b_hh", init, (4 * self.hidden,))

        if static_steps is not None:
            # (B, 4H) once; every step reads the same projection
            x_proj = (
                xs.astype(self.dtype) @ w_ih.astype(self.dtype)
                + (b_ih + b_hh).astype(self.dtype)
            )
        else:
            # time-major first, then one large (T*B, D) x (D, 4H) matmul
            x_proj = (
                jnp.swapaxes(xs, 0, 1).astype(self.dtype)
                @ w_ih.astype(self.dtype)
                + (b_ih + b_hh).astype(self.dtype)
            )

        if initial_carry is None:
            h0 = jnp.zeros((B, self.hidden), self.dtype)
            c0 = jnp.zeros((B, self.hidden), self.dtype)
        else:
            h0, c0 = initial_carry
            h0 = h0.astype(self.dtype)
            c0 = c0.astype(self.dtype)

        w_hh_c = w_hh.astype(self.dtype)

        def step(carry, inp):
            h, c, t = carry
            xp = x_proj if static_steps is not None else inp
            gates = xp + h @ w_hh_c
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            if lengths is not None:
                valid = (t < lengths)[:, None]
                h_new = jnp.where(valid, h_new, h)
                c_new = jnp.where(valid, c_new, c)
            return (h_new, c_new, t + 1), (h_new if return_sequences else None)

        if self.remat_cell:
            # recompute the gate chain in backward instead of streaming the
            # stacked (T, B, 4H) sigmoid/tanh residuals from HBM — a
            # FLOPs-for-bandwidth trade for HBM-bound steps
            step = jax.checkpoint(step)
        (h_fin, c_fin, _), hs = jax.lax.scan(
            step, (h0, c0, jnp.zeros((), jnp.int32)),
            None if static_steps is not None else x_proj,
            length=T if static_steps is not None else None,
        )
        if not return_sequences:
            return None, (h_fin, c_fin)
        return jnp.swapaxes(hs, 0, 1), (h_fin, c_fin)
