"""Serving-gap audit: decompose the e2e pipeline time into its stages.

VERDICT r2 item 7: the e2e behavior-transfer pipeline measures ~2,367 f/s
while the bare du+dd (transfer_cached) stage ceiling measured ~2,850 f/s in
isolation — this harness measures, at the EXACT bench shapes (B=20, T=50,
256px, 125-frame chunks), on the same chip, with the same honest
feedback-loop timing:

  1. e2e           — the full generate() program (bench.py headline),
  2. front         — flow inverse -> rollout -> unnormalize -> project ->
                     device stickman raster -> appearance encode,
  3. synth         — the chunked transfer_cached stage alone (du+dd),
  4. e2e_int8      — the documented serving preset: quant=int8_static +
                     quant_max_hw=128 (numerics: QUANT_ABLATION.json).

and reports the residual  e2e - (front + synth): the part of the gap that
is NOT stage work (dispatch/relayout/fusion-boundary cost of composing the
stages into one program).  Writes SERVING_GAP.json at the repo root.

Run on the chip: python examples/serving_gap_audit.py
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

from behavior_driven_video_synthesis_tpu.data.human36m import (
    detailed_joint_model,
)
from behavior_driven_video_synthesis_tpu.models import ResidualBehaviorNet
from behavior_driven_video_synthesis_tpu.models.flows import LatentFlow
from behavior_driven_video_synthesis_tpu.models.vunet import VUNet
from behavior_driven_video_synthesis_tpu.pipeline import (
    BehaviorTransferPipeline,
)

B = int(os.environ.get("BENCH_BATCH", "20"))
S = int(os.environ.get("BENCH_SPATIAL", "256"))
T = int(os.environ.get("BENCH_LENGTH", "50"))
N_ITERS = int(os.environ.get("BENCH_ITERS", "8"))
HID, K_FULL, K_USE = 1024, 51, 48


def build(quant="none", quant_max_hw=0):
    jm = detailed_joint_model(world_coords=True)
    behavior = ResidualBehaviorNet(n_kps=K_USE, dim_hidden_b=HID,
                                   dtype=jnp.bfloat16)
    vunet = VUNet(spatial_size=S, nf_start=32, nf_max=128, variant="alter",
                  quant=quant, quant_max_hw=quant_max_hw,
                  dtype=jnp.bfloat16)
    flow = LatentFlow(flow_in_channels=HID, flow_mid_channels=2 * HID,
                      n_flows=15)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    mean = rng.randn(K_FULL).astype(np.float32)
    std = (np.abs(rng.rand(K_FULL)) + 0.5).astype(np.float32)
    dim_to_use = np.arange(K_FULL)[np.arange(K_FULL) % 17 != 0][:K_USE]

    x = jnp.zeros((B, T, K_USE))
    bp = behavior.init({"params": key, "sample": key}, x, x, T)["params"]
    app = jnp.zeros((B, S, S, 3))
    vp = vunet.init({"params": key, "sample": key}, app, app)["params"]
    fv = flow.init({"params": key}, jnp.zeros((B, HID)))
    pipe = BehaviorTransferPipeline(behavior, vunet, jm, mean, std,
                                    dim_to_use, spatial_size=S,
                                    flow_model=flow, vunet_chunk=128)
    params = {"behavior": bp, "vunet": vp, "flow": fv}
    z = jax.random.normal(key, (B, HID))
    x_start = jnp.zeros((B, K_USE))
    extr = jnp.tile(jnp.asarray(
        np.hstack([np.eye(3), [[0], [0], [4.0]]]), jnp.float32), (B, 1, 1))
    intr = jnp.tile(jnp.asarray([1145.0, 500.0, 1143.0, 500.0]), (B, 1))
    imsize = jnp.full((B, 2), 1000.0)
    if quant == "int8_static":
        params["vunet_quant"] = pipe.calibrate(
            params, z[:2], x_start[:2], app[:2], extr[:2], intr[:2],
            imsize[:2], key, length=T)
    return pipe, vunet, params, (z, x_start, app, extr, intr, imsize), key


def timed(loop, args, key, frames_per_iter):
    """Compile once, min-of-3 feedback-loop timing; returns a row dict."""
    compiled = jax.jit(loop).lower(*args, key).compile()
    float(compiled(*args, key))  # warm
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        float(compiled(*args, jax.random.fold_in(key, r)))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {
        "fps": round(frames_per_iter * N_ITERS / dt, 2),
        "ms_per_run": round(dt / N_ITERS * 1000, 3),
        "seconds_total": round(dt, 4),
    }


def audit():
    out = {"batch": B, "spatial": S, "length": T, "n_iters": N_ITERS,
           "chunk": 125 if (B * T) % 125 == 0 else None,
           "platform": jax.devices()[0].platform, "stages": {}}

    pipe, vunet, params, args, key = build()
    z, x_start, app, extr, intr, imsize = args

    # 1) e2e (the bench.py headline program)
    def e2e_loop(params, z, x_start, app, extr, intr, imsize, k0):
        def body(i, carry):
            acc, z, k = carry
            frames = pipe.generate(params, z, x_start, app, extr, intr,
                                   imsize, k, length=T)["frames"]
            d = jnp.mean(frames.astype(jnp.float32)) * 1e-6
            return (acc + d, z + d, jax.random.fold_in(k, i))
        acc, _, _ = jax.lax.fori_loop(0, N_ITERS, body,
                                      (jnp.zeros(()), z, k0))
        return acc

    out["stages"]["e2e"] = timed(e2e_loop, (params,) + args, key, B * T)
    print("e2e:", out["stages"]["e2e"], flush=True)

    # 2) front stages only (everything generate() runs BEFORE the chunked
    #    VUNet synthesis; includes the once-per-video appearance encode)
    def front_loop(params, z, x_start, app, extr, intr, imsize, k0):
        def body(i, carry):
            acc, z, k = carry
            world, px, stick, flat_stick, means = pipe._front_stages(
                params, z, x_start, app, extr, intr, imsize, k, T, True)
            d = (jnp.mean(flat_stick.astype(jnp.float32))
                 + jnp.mean(means[0].astype(jnp.float32))) * 1e-6
            return (acc + d, z + d, jax.random.fold_in(k, i))
        acc, _, _ = jax.lax.fori_loop(0, N_ITERS, body,
                                      (jnp.zeros(()), z, k0))
        return acc

    out["stages"]["front"] = timed(front_loop, (params,) + args, key, B * T)
    print("front:", out["stages"]["front"], flush=True)

    # 3) synth stage alone: chunked transfer_cached on fixed-shape inputs
    #    (exactly what generate() runs after the front stages)
    n = B * T
    cs, n_pad = pipe._chunk_size(n)
    _, _, _, flat_stick0, means0 = jax.jit(
        lambda p, k: pipe._front_stages(p, z, x_start, app, extr, intr,
                                        imsize, k, T, True),
        static_argnames=())(params, key)
    m_chunked = tuple(
        m.reshape((n_pad // cs, cs) + m.shape[1:]) for m in means0)
    s_chunked = flat_stick0.reshape((n_pad // cs, cs)
                                    + flat_stick0.shape[1:])

    def synth_loop(vp, m_chunked, s_chunked, k0):
        def synth_chunk(args_):
            m_c, s_c = args_
            return vunet.apply({"params": vp}, list(m_c), s_c,
                               method=vunet.transfer_cached)

        def body(i, carry):
            acc, s, k = carry
            frames = jax.lax.map(synth_chunk, (m_chunked, s))
            d = jnp.mean(frames.astype(jnp.float32)) * 1e-6
            return (acc + d, s + d.astype(s.dtype), jax.random.fold_in(k, i))

        acc, _, _ = jax.lax.fori_loop(0, N_ITERS, body,
                                      (jnp.zeros(()), s_chunked, k0))
        return acc

    out["stages"]["synth"] = timed(
        synth_loop, (params["vunet"], m_chunked, s_chunked), key, n)
    print("synth:", out["stages"]["synth"], flush=True)

    # 4) int8_static + quant_max_hw=128 serving preset (documented numerics:
    #    QUANT_ABLATION.json)
    pipe_q, _, params_q, args_q, key_q = build("int8_static", 128)

    def e2e_q_loop(params, z, x_start, app, extr, intr, imsize, k0):
        def body(i, carry):
            acc, z, k = carry
            frames = pipe_q.generate(params, z, x_start, app, extr, intr,
                                     imsize, k, length=T)["frames"]
            d = jnp.mean(frames.astype(jnp.float32)) * 1e-6
            return (acc + d, z + d, jax.random.fold_in(k, i))
        acc, _, _ = jax.lax.fori_loop(0, N_ITERS, body,
                                      (jnp.zeros(()), z, k0))
        return acc

    out["stages"]["e2e_int8_preset"] = timed(
        e2e_q_loop, (params_q,) + args_q, key_q, B * T)
    print("e2e_int8_preset:", out["stages"]["e2e_int8_preset"], flush=True)

    st = out["stages"]
    residual = st["e2e"]["ms_per_run"] - (st["front"]["ms_per_run"]
                                          + st["synth"]["ms_per_run"])
    out["decomposition"] = {
        "e2e_ms": st["e2e"]["ms_per_run"],
        "front_ms": st["front"]["ms_per_run"],
        "synth_ms": st["synth"]["ms_per_run"],
        "residual_ms": round(residual, 3),
        "residual_pct_of_e2e": round(
            100 * residual / st["e2e"]["ms_per_run"], 2),
        "note": "residual = composition cost (relayouts/fusion boundaries "
                "between stages inside one program); a small residual means "
                "the e2e program is stage-work-bound and the gap to the "
                "isolated synth ceiling is front-stage work, not overhead",
    }
    return out


if __name__ == "__main__":
    result = audit()
    path = os.path.join(os.path.dirname(__file__), "..", "SERVING_GAP.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["decomposition"]))
    print("wrote", os.path.abspath(path))
