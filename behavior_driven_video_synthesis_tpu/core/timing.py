"""Shared honest-timing protocols for the relayed TPU.

Two protocols, both born from measurement bugs documented in ROADMAP.md
and previously hand-copied across bench.py / examples/per_conv_audit.py /
examples/train_floors.py / examples/soak.py (code-review round 5 asked
for one implementation so the protocol cannot drift between the rows it
compares):

* :func:`two_point_op_time` — isolated-op floor timing.  Each relay
  dispatch carries ~20-30 ms of constant overhead, so a single dispatch
  divided by a fixed trip count buries sub-millisecond ops; timing the
  same op at two trip counts n1 < n2 and taking (t2-t1)/(n2-n1) cancels
  the constant exactly.  The loop feeds a scalar derived from the output
  back into the input so XLA can never hoist the body.

* :func:`time_step_loop` — train-step throughput.  One jitted fori_loop
  of ``n_iters`` steps per dispatch (relay round-trips never pollute the
  timing), state donated exactly like the real training drivers (an
  undonated output-state alloc+copy measured ~20% slower at the 630M
  scale), completion forced by fetching a scalar (block_until_ready
  returns before device execution completes on this relay), min of
  ``repeats``.
"""
from __future__ import annotations

import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def two_point_op_time(run_op: Callable, x, w, flops_each: float,
                      target_s: float = 0.08, assumed_tflops: float = 20.0,
                      min_dt: float = 1e-8) -> float:
    """Seconds per isolated execution of ``run_op(x, w)``.

    ``flops_each`` sizes the trip counts so the n2 run does ~``target_s``
    of real device work at an assumed ``assumed_tflops`` rate.
    """

    def make_loop(n_iters):
        def loop(x, w):
            def body(i, carry):
                acc, x = carry
                y = run_op(x, w)
                m = jnp.mean(y.astype(jnp.float32))
                return acc + m, (x * (1 + m * 1e-12)).astype(x.dtype)
            acc, _ = lax.fori_loop(0, n_iters, body, (jnp.zeros(()), x))
            return acc
        return loop

    est = max(flops_each / (assumed_tflops * 1e12), 5e-6)
    n2 = int(min(6000, max(100, round(target_s / est))))
    n1 = max(10, n2 // 5)

    def measure(n_iters):
        compiled = jax.jit(make_loop(n_iters)).lower(x, w).compile()
        float(compiled(x, w))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(x, w))
            times.append(time.perf_counter() - t0)
        return min(times)

    t1, t2 = measure(n1), measure(n2)
    return max((t2 - t1) / (n2 - n1), min_dt)


def make_operand(shape, dtype, scale: float = 0.1, seed: int = 0):
    """Random operand for isolated-op timing; integer dtypes (int8 quant
    paths) draw integers instead of a scaled normal that would round to
    all-zeros."""
    rng = np.random.RandomState(seed)
    if np.issubdtype(np.dtype(dtype), np.integer):
        return jnp.asarray(rng.randint(-100, 100, shape), dtype)
    return jnp.asarray(rng.randn(*shape) * scale, dtype)


def time_step_loop(step: Callable, state, batch, key, n_iters: int,
                   fetch: Callable, donate: bool = True,
                   repeats: int = 3):
    """Seconds for ``n_iters`` sequential ``step(state, batch, key)``
    calls compiled as ONE fori_loop dispatch.  ``fetch(state)`` must
    return a scalar jnp value (forces completion through the relay).
    Returns (dt_seconds, final_state, compiled) — the compiled loop is
    exposed for cost_analysis-based FLOP accounting."""

    def loop(state, batch, k0):
        def body(i, carry):
            st, k = carry
            st, _ = step(st, batch, k)
            return st, jax.random.fold_in(k, i)
        st, _ = lax.fori_loop(0, n_iters, body, (state, k0))
        return st

    jit_kw = {"donate_argnums": (0,)} if donate else {}
    compiled = jax.jit(loop, **jit_kw).lower(state, batch, key).compile()
    st = compiled(state, batch, key)
    float(fetch(st))
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        st = compiled(st, batch, jax.random.fold_in(key, r))
        float(fetch(st))
        times.append(time.perf_counter() - t0)
    return min(times), st, compiled
