"""Space-to-depth channel packing probe for the lane-underfilled serving
convs (VERDICT r4 item 3a).

Question: the serving stage's dominant conv class (256^2 x C32 3x3,
36% of conv self-time, 51 TF/s isolated = 26% of peak because 32
channels fill only a quarter of the MXU's 128 output lanes) — does
re-expressing it over the packed layout (128^2 x C128, s2d of 2x2
blocks) run faster?

The packed conv is EXACT: a 3x3 conv over the packed layout whose
(in-sub-position, out-sub-position, offset) taps are the original
kernel's taps re-indexed — but the stored-dense packed kernel is 75%
zeros (each output sub-position touches only 9 of the 36 packed taps),
so the packed conv does 4x the MACs.  The round-1 analysis (ROADMAP.md
gap 3) predicted the block-structured sparsity always cancels the lane
gain; the round-4 verdict asked for the measurement at the exact
serving shapes.  This script is that measurement, plus the equality
check.  Writes S2D_PROBE.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp


def s2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel block index = 2p + q for
    sub-position (p, q)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def pack_kernel(w):
    """(3, 3, Ci, Co) -> (3, 3, 4Ci, 4Co) packed-layout kernel.

    Packed output channel (2a+b)*Co+co at packed offset (di, dj) reads
    packed input channel (2p+q)*Ci+ci, where for the row axis
    t = a - 1 + u (u the original kernel row), di = floor(t/2),
    p = t mod 2 — and symmetrically for columns."""
    Ci, Co = w.shape[2], w.shape[3]
    wp = np.zeros((3, 3, 4 * Ci, 4 * Co), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for u in range(3):
                for v in range(3):
                    t_r, t_c = a - 1 + u, b - 1 + v
                    di, p = t_r // 2, t_r % 2
                    dj, q = t_c // 2, t_c % 2
                    wp[di + 1, dj + 1,
                       (2 * p + q) * Ci:(2 * p + q + 1) * Ci,
                       (2 * a + b) * Co:(2 * a + b + 1) * Co] += w[u, v]
    return wp


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def time_fn(f, x, n1=8, n2=40):
    """Overhead-cancelling two-point feedback-loop timing (ms/call)."""
    def loop(n):
        def body(i, c):
            acc, xx = c
            y = f(xx)
            d = jnp.sum(y.astype(jnp.float32)) * 1e-9
            return acc + d, xx + d.astype(xx.dtype)
        return jax.jit(
            lambda xx: jax.lax.fori_loop(0, n, body, (jnp.zeros(()), xx))[0])
    c1 = loop(n1).lower(x).compile()
    c2 = loop(n2).lower(x).compile()
    float(c1(x)); float(c2(x))
    t1, t2 = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(x)); t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(c2(x)); t2.append(time.perf_counter() - t0)
    return (min(t2) - min(t1)) / (n2 - n1) * 1e3


def probe(B, H, C, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, H, C), dtype)
    w = np.asarray(jax.random.normal(jax.random.fold_in(key, 1),
                                     (3, 3, C, C), jnp.float32)) * 0.1
    wb = jnp.asarray(w, dtype)
    wp = jnp.asarray(pack_kernel(w), dtype)
    xp = s2d(x)

    # equality: s2d(conv(x)) == packed_conv(s2d(x)) (f32 reference)
    y = conv(x.astype(jnp.float32), jnp.asarray(w))
    yp = conv(xp.astype(jnp.float32), jnp.asarray(pack_kernel(w)))
    err = float(jnp.max(jnp.abs(s2d(y) - yp)) / jnp.max(jnp.abs(y)))
    assert err < 1e-5, f"packed conv is not exact: rel {err}"

    t_orig = time_fn(lambda v: conv(v, wb), x)
    t_pack = time_fn(lambda v: conv(v, wp), xp)
    # end-to-end variant: pays the s2d/d2s relayout inside the timed body
    # (what wiring it into the model would actually cost between unpacked
    # neighbours)
    t_pack_relayout = time_fn(
        lambda v: conv(s2d(v), wp), x)
    gflop = 2 * B * H * H * 9 * C * C / 1e9
    row = {
        "shape": f"{B}x{H}x{H}x{C}", "dtype": str(dtype.__name__),
        "exact_rel_err": err,
        "orig_ms": round(t_orig, 3),
        "orig_tflops": round(gflop / t_orig, 1),
        "packed_ms": round(t_pack, 3),
        "packed_tflops_useful": round(gflop / t_pack, 1),
        "packed_plus_s2d_ms": round(t_pack_relayout, 3),
        "speedup_packed": round(t_orig / t_pack, 3),
        "speedup_packed_with_relayout": round(t_orig / t_pack_relayout, 3),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    B = int(os.environ.get("PROBE_BATCH", "125"))
    rows = [
        probe(B, 256, 32),     # the dominant serving class (36% self-time)
        probe(B, 128, 64),     # the half-filled second class (23%)
    ]
    out = {
        "device": jax.devices()[0].device_kind,
        "note": ("exact s2d channel packing of the lane-underfilled "
                 "serving convs: packed = 4x MACs on a 75%-zero "
                 "stored-dense kernel at full 128 lanes; 'useful' "
                 "TF/s counts only the original conv's FLOPs"),
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "S2D_PROBE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
