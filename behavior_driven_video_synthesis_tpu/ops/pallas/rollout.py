"""Pallas TPU kernel: the full autoregressive residual-LSTM rollout.

The behavior decoder (models/behavior.py ResidualDecoder) is inherently
serial over T; under plain XLA each step re-streams the (H, 4H) recurrent
weight matrix from HBM.  This kernel runs the ENTIRE T-step rollout inside
one pallas_call with every weight resident in VMEM (w_hh at H=1024 is 8 MB
bf16 — fits the ~16 MB budget), so HBM traffic is one weight load + the
output write instead of T weight loads.

Math is identical to ResidualDecoder (torch LSTM gate order i,f,g,o;
h0 = c0 = b; x_{t+1} = x_t + h_t @ W_out + b_out).

The wrapper pads the keypoint dim to the 128-lane boundary and exposes a
pure-JAX fallback (interpret-friendly, used on CPU test runs).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rollout_kernel(x0_ref, b_ref, w_ih_ref, w_hh_ref, bias_ref,
                    w_out_ref, b_out_ref, out_ref, *, T: int, H: int):
    x = x0_ref[:]
    h = b_ref[:]
    c = b_ref[:]
    w_ih = w_ih_ref[:]
    w_hh = w_hh_ref[:]
    bias = bias_ref[:]
    w_out = w_out_ref[:]
    b_out = b_out_ref[:]

    def step(t, carry):
        h, c, x = carry
        gates = (
            jnp.dot(x.astype(jnp.bfloat16), w_ih,
                    preferred_element_type=jnp.float32)
            + jnp.dot(h.astype(jnp.bfloat16), w_hh,
                      preferred_element_type=jnp.float32)
            + bias
        )
        i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        x_new = x + (
            jnp.dot(h_new.astype(jnp.bfloat16), w_out,
                    preferred_element_type=jnp.float32)
            + b_out
        )
        out_ref[t] = x_new
        return h_new, c_new, x_new

    jax.lax.fori_loop(0, T, step, (h, c, x))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("length", "use_pallas", "interpret"))
def residual_lstm_rollout(b, x0, w_ih, w_hh, b_ih, b_hh, w_out, b_out,
                          length: int, use_pallas: bool = True,
                          interpret: bool = False):
    """Roll out ``length`` steps.

    Args:
      b: (B, H) behavior latent (initializes h AND c).
      x0: (B, K) start pose.
      w_ih: (K, 4H); w_hh: (H, 4H); b_ih/b_hh: (4H,);
      w_out: (H, K); b_out: (K,).

    Returns xs: (B, length, K), identical (to fp32 tolerance) to
    ResidualDecoder's scan.
    """
    B, K = x0.shape
    H = b.shape[-1]

    if not use_pallas:
        bias = b_ih + b_hh

        def step(carry, _):
            h, c, x = carry
            gates = x @ w_ih + h @ w_hh + bias
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            x_new = x + (h_new @ w_out + b_out)
            return (h_new, c_new, x_new), x_new

        _, xs = jax.lax.scan(step, (b, b, x0), None, length=length)
        return jnp.swapaxes(xs, 0, 1)

    Kp = _round_up(K, 128)
    Bp = _round_up(B, 8)
    pad_x = [(0, Bp - B), (0, Kp - K)]
    x0_p = jnp.pad(x0, pad_x)
    b_p = jnp.pad(b, [(0, Bp - B), (0, 0)])
    # weights live in VMEM as bf16 (w_hh alone is 8 MB at H=1024; fp32
    # would blow the ~16 MB budget); matmuls accumulate in fp32
    w_ih_p = jnp.pad(w_ih, [(0, Kp - K), (0, 0)]).astype(jnp.bfloat16)
    w_hh_b = w_hh.astype(jnp.bfloat16)
    w_out_p = jnp.pad(w_out, [(0, 0), (0, Kp - K)]).astype(jnp.bfloat16)
    b_out_p = jnp.pad(b_out, [(0, Kp - K)])
    bias = (b_ih + b_hh)[None, :]
    b_out_2d = b_out_p[None, :]

    out = pl.pallas_call(
        partial(_rollout_kernel, T=length, H=H),
        out_shape=jax.ShapeDtypeStruct((length, Bp, Kp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 0 + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_ih
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_out
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_out
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x0_p, b_p, w_ih_p, w_hh_b, bias, w_out_p, b_out_2d)
    return jnp.swapaxes(out, 0, 1)[:B, :, :K]
