"""Per-conv serving-gap audit (VERDICT r3 item 3).

The round-3 bench reported the bf16 e2e pipeline at 0.47 of a 22 TF/s
"FLOP-weighted XLA conv envelope" — but that envelope was extrapolated
from only THREE proxy shapes (256^2xC32 / 128^2xC64 / 64^2xC128, measured
at B=8).  This harness closes the accounting below stage granularity, at
the exact serving shapes (chunk=125 frames, 256px):

  1. walk the jaxpr of one synth chunk (du+dd transfer_cached, the
     reference's VunetAlter generator path, /root/reference/models/
     vunets.py:264-424) and extract the TRUE conv inventory — every
     conv_general_dilated with its shapes/strides/dtype and multiplicity;
  2. time each distinct conv ISOLATED at identical shape+batch with the
     same honest feedback-loop protocol -> the measured XLA conv floor:
     the time the stage would take if it were nothing but XLA's own
     best-case convs back to back;
  3. time the full chunked synth stage (as SERVING_GAP.json does);
  4. profile the compiled stage (core/profiling.device_op_table) and
     bucket per-fusion device self time into conv / copy / other, matching
     conv fusions to inventory rows by output shape where the trace
     metadata allows.

Outputs a per-conv table into SERVING_GAP.json under "per_conv":
for every distinct conv: count, FLOPs, isolated us, achieved TF/s, and
(where matched) in-graph us — so every lost millisecond has an address.
Also reports envelope_true_tflops = total conv FLOPs / conv floor time:
the honest envelope over the real conv mix, replacing the 3-shape proxy.

Run on the chip: python examples/per_conv_audit.py
"""
import argparse
import json
import os
import re
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
from jax import lax

from behavior_driven_video_synthesis_tpu.core.profiling import (
    device_op_table,
    trace,
)

B = int(os.environ.get("BENCH_BATCH", "20"))
S = int(os.environ.get("BENCH_SPATIAL", "256"))
T = int(os.environ.get("BENCH_LENGTH", "50"))
N_ITERS = int(os.environ.get("BENCH_ITERS", "8"))
HID, K_FULL, K_USE = 1024, 51, 48


# ---------------------------------------------------------------- inventory

def _walk_jaxpr(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            out.append(eqn)
        for v in eqn.params.values():
            vs = v if isinstance(v, (list, tuple)) else (v,)
            for u in vs:
                if hasattr(u, "jaxpr"):        # ClosedJaxpr
                    _walk_jaxpr(u.jaxpr, out)
                elif hasattr(u, "eqns"):       # Jaxpr
                    _walk_jaxpr(u, out)


def conv_inventory(fn, *args):
    """Distinct conv configs (with multiplicity) in fn's jaxpr."""
    eqns = []
    _walk_jaxpr(jax.make_jaxpr(fn)(*args).jaxpr, eqns)
    inv = {}
    for eqn in eqns:
        lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
        out = eqn.outvars[0].aval
        p = eqn.params
        sig = (tuple(lhs.shape), tuple(rhs.shape), str(lhs.dtype),
               str(rhs.dtype), str(out.dtype), tuple(p["window_strides"]),
               tuple(tuple(q) for q in p["padding"]),
               tuple(p["lhs_dilation"]), tuple(p["rhs_dilation"]),
               int(p["feature_group_count"]))
        if sig not in inv:
            # FLOPs: 2 * output positions * Cin/fgc * prod(kernel spatial);
            # read the kernel dims from the conv's own dimension numbers so
            # the formula holds for dgrad/wgrad layouts too
            dn = p["dimension_numbers"]
            out_shape = tuple(out.shape)
            cin_g = rhs.shape[dn.rhs_spec[1]]
            k_spatial = float(np.prod([rhs.shape[d]
                                       for d in dn.rhs_spec[2:]]))
            flops = 2.0 * float(np.prod(out_shape)) * cin_g * k_spatial
            inv[sig] = {
                "lhs": list(lhs.shape), "rhs": list(rhs.shape),
                "out": list(out_shape), "lhs_dtype": str(lhs.dtype),
                "rhs_dtype": str(rhs.dtype),
                "out_dtype": str(out.dtype),
                "strides": list(p["window_strides"]),
                "padding": [list(q) for q in p["padding"]],
                "lhs_dilation": list(p["lhs_dilation"]),
                "rhs_dilation": list(p["rhs_dilation"]),
                "fgc": int(p["feature_group_count"]),
                "flops_each": flops, "count": 0,
                "_params": p,
            }
        inv[sig]["count"] += 1
    return list(inv.values())


# ---------------------------------------------------------------- timing

def time_conv(row, target_s=0.08):
    """Two-point feedback-loop timing of one isolated conv — the
    dispatch-overhead-cancelling protocol now shared in
    core.timing.two_point_op_time (the constant ~20-30 ms relay dispatch
    cost had inflated small-conv times ~1.3 ms each under fixed
    n_iters; see that module's docstring)."""
    from behavior_driven_video_synthesis_tpu.core.timing import (
        make_operand,
        two_point_op_time,
    )

    p = row["_params"]
    x = make_operand(row["lhs"], row["lhs_dtype"])
    w = make_operand(row["rhs"], row.get("rhs_dtype", row["lhs_dtype"]))

    def run(x, w):
        return lax.conv_general_dilated(
            x, w, p["window_strides"], p["padding"],
            lhs_dilation=p["lhs_dilation"],
            rhs_dilation=p["rhs_dilation"],
            dimension_numbers=p["dimension_numbers"],
            feature_group_count=p["feature_group_count"],
            precision=p["precision"],
            preferred_element_type=p["preferred_element_type"])

    return two_point_op_time(run, x, w, row["flops_each"],
                             target_s=target_s, min_dt=1e-7)


# ---------------------------------------------------------------- stage

def build_synth(quant="none", quant_max_hw=0):
    from behavior_driven_video_synthesis_tpu.data.human36m import (
        detailed_joint_model,
    )
    from behavior_driven_video_synthesis_tpu.models import (
        ResidualBehaviorNet,
    )
    from behavior_driven_video_synthesis_tpu.models.flows import LatentFlow
    from behavior_driven_video_synthesis_tpu.models.vunet import VUNet
    from behavior_driven_video_synthesis_tpu.pipeline import (
        BehaviorTransferPipeline,
    )

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

    n = B * T
    cs, n_pad = pipe._chunk_size(n)
    _, _, _, flat_stick0, means0 = jax.jit(
        lambda p, k: pipe._front_stages(p, z, x_start, app, extr, intr,
                                        imsize, k, T, True))(params, key)
    m_chunked = tuple(
        m.reshape((n_pad // cs, cs) + m.shape[1:]) for m in means0)
    s_chunked = flat_stick0.reshape((n_pad // cs, cs)
                                    + flat_stick0.shape[1:])
    quant_coll = None
    if quant == "int8_static":
        from behavior_driven_video_synthesis_tpu.models.vunet import (
            calibrate_quant,
        )

        quant_coll = calibrate_quant(
            vunet, {"params": params["vunet"]},
            [m[0][:8] for m in m_chunked], s_chunked[0][:8])["quant"]
    return (vunet, params["vunet"], m_chunked, s_chunked, cs,
            n_pad // cs, quant_coll)


def build_cvbae_train():
    """The bench.py cvbae train step at bench shapes (B=12, 256px):
    ONE train step (fwd+bwd+adam); the conv inventory of its jaxpr covers
    forward, input-grad and weight-grad convs.  Mirrors bench.py's row
    config exactly via the shared builder: the SHIPPED production default
    (laplacian perceptual + trained regressor + dropout 0.05);
    BENCH_CVBAE_VGG=1 restores the r3-era bf16-VGG/no-regressor config."""
    from behavior_driven_video_synthesis_tpu.train.bench_harness import (
        build_cvbae_bench_step,
    )

    Bt = int(os.environ.get("BENCH_TRAIN_BATCH", "12"))
    use_vgg = os.environ.get("BENCH_CVBAE_VGG", "0") == "1"
    state, step, batch = build_cvbae_bench_step(
        Bt, S, regressor_on=not use_vgg,
        features=jnp.bfloat16 if use_vgg else "laplacian")
    return state, step, batch, Bt


SHAPE_RE = re.compile(r"(?:bf16|f32|s8|s32|f16)\[([0-9,]+)\]")


def classify_profile(rows, runs):
    """Bucket device self time into conv / copy / other; collect per-shape
    conv totals where the fusion metadata exposes an output shape."""
    buckets = {"conv": 0.0, "copy": 0.0, "other": 0.0}
    conv_by_shape = {}
    detail = []
    for r in rows:
        name = r["op"]
        meta_txt = " ".join(str(v) for v in r.get("meta", {}).values())
        is_conv = ("conv" in name or "conv" in meta_txt)
        is_copy = (name.startswith("copy") or "transpose" in name
                   or name.startswith("bitcast"))
        key = "conv" if is_conv else ("copy" if is_copy else "other")
        buckets[key] += r["us_per_run"]
        if is_conv:
            m = SHAPE_RE.search(meta_txt) or SHAPE_RE.search(name)
            shp = m.group(1) if m else "unknown"
            conv_by_shape[shp] = conv_by_shape.get(shp, 0.0) \
                + r["us_per_run"]
        if r["share"] > 0.005:
            detail.append({"op": name, "us_per_run": round(r["us_per_run"],
                                                           1),
                           "share": round(r["share"], 4),
                           "kind": key})
    return buckets, conv_by_shape, detail


def audit_cvbae_train(out_path):
    """Conv inventory + isolated floor for the cvbae TRAIN step: gives the
    bench train row its envelope denominator (VERDICT r3 item 2).  Writes
    {"train_conv_floor": ...} into CVBAE_RECONCILE.json."""
    state, step, batch, Bt = build_cvbae_train()
    key = jax.random.PRNGKey(0)
    inv = conv_inventory(lambda s, b, k: step(s, b, k)[0].vunet.params,
                         state, batch, key)
    inv.sort(key=lambda r: -r["flops_each"] * r["count"])
    total_flops = sum(r["flops_each"] * r["count"] for r in inv)
    print(f"train: {len(inv)} distinct convs, "
          f"{sum(r['count'] for r in inv)} total, "
          f"{total_flops / 1e9:.2f} GFLOP/step", flush=True)
    floor_s = 0.0
    for r in inv:
        dt = time_conv(r)
        r["isolated_us"] = round(dt * 1e6, 1)
        r["isolated_tflops"] = round(r["flops_each"] / dt / 1e12, 2)
        floor_s += dt * r["count"]
        print(f"  {r['lhs']}x{r['rhs']}->{r['out']} s{r['strides']} "
              f"ld{r['lhs_dilation']} x{r['count']}: {r['isolated_us']}us "
              f"{r['isolated_tflops']}TF/s", flush=True)
        del r["_params"]
    envelope = total_flops / floor_s / 1e12
    summary = {
        "batch": Bt, "spatial": S,
        "conv_floor_ms_per_step": round(floor_s * 1e3, 2),
        "conv_flops_per_step_g": round(total_flops / 1e9, 2),
        "train_envelope_tflops": round(envelope, 2),
        "note": "floor = sum of isolated best-case XLA conv times over the "
                "step's full conv inventory (fwd + dgrad + wgrad); the "
                "envelope is the rate a step that were pure back-to-back "
                "convs would achieve — bench.py's frac_of_envelope "
                "denominator for the train row",
    }
    print(json.dumps(summary), flush=True)
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)
    data["train_conv_floor"] = {"summary": summary, "inventory": inv}
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)
    print("wrote", os.path.abspath(out_path))


def audit_attic_rnb(out_path):
    """Re-measure the retired packed-matmul fused-RNB Pallas kernel
    (attic/pallas_rnb.py) at the SERVING batch (chunk=125) — its retirement
    measurements were at B=8 (VERDICT r3 item 3 asks for the re-check).
    Compares one full RNB (elu -> 3x3 weight-norm conv -> affine ->
    residual) per scale: Pallas kernel vs the XLA lowering of the same
    computation."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "attic"))
    from pallas_rnb import fused_rnb, rnb_reference

    cs = 125
    rows = []
    for (H, C) in ((256, 32), (128, 64), (64, 128)):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(cs, H, H, C) * 0.1, jnp.bfloat16)
        params = {
            "v": rng.randn(3, 3, C, C).astype(np.float32) * 0.05,
            "g": rng.rand(C).astype(np.float32) + 0.5,
            "bias": rng.randn(C).astype(np.float32) * 0.01,
            "gamma": rng.rand(C).astype(np.float32) + 0.5,
            "beta": rng.randn(C).astype(np.float32) * 0.01,
        }
        row = {"shape": [cs, H, H, C]}
        for name, fn in (("pallas", lambda x: fused_rnb(x, params)),
                         ("xla", lambda x: rnb_reference(
                             x, params).astype(jnp.bfloat16))):
            def loop(x):
                def body(i, carry):
                    acc, x = carry
                    y = fn(x)
                    m = jnp.mean(y.astype(jnp.float32))
                    return acc + m, (x * (1 + m * 1e-12)).astype(x.dtype)
                acc, _ = lax.fori_loop(0, 8, body, (jnp.zeros(()), x))
                return acc
            try:
                compiled = jax.jit(loop).lower(x).compile()
                float(compiled(x))
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(compiled(x))
                    times.append(time.perf_counter() - t0)
                row[f"{name}_us"] = round(min(times) / 8 * 1e6, 1)
            except Exception as e:  # VMEM/layout limits at this batch
                row[f"{name}_error"] = str(e)[:200]
        rows.append(row)
        print(row, flush=True)
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)
    data["attic_rnb_at_serving_batch"] = {
        "chunk": cs, "rows": rows,
        "note": "retirement re-check at the serving chunk batch "
                "(VERDICT r3 item 3); kernel stays in attic/ unless "
                "pallas_us beats xla_us at a scale that matters"}
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)
    print("wrote", os.path.abspath(out_path))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-profile", action="store_true")
    ap.add_argument("--target", choices=["synth", "cvbae_train",
                                         "attic_rnb"],
                    default="synth")
    ap.add_argument("--quant", default="none",
                    help="int8_static to audit the TPU serving preset's "
                         "program (pair with --quant-max-hw)")
    ap.add_argument("--quant-max-hw", type=int, default=0)
    args = ap.parse_args()
    root = os.path.join(os.path.dirname(__file__), "..")
    if args.target == "cvbae_train":
        audit_cvbae_train(args.out or os.path.join(root,
                                                   "CVBAE_RECONCILE.json"))
        return
    if args.target == "attic_rnb":
        audit_attic_rnb(args.out or os.path.join(root, "SERVING_GAP.json"))
        return
    args.out = args.out or os.path.join(root, "SERVING_GAP.json")

    vunet, vp, m_chunked, s_chunked, cs, n_chunks, quant_coll = \
        build_synth(args.quant, args.quant_max_hw)
    print(f"chunk={cs} n_chunks={n_chunks} quant={args.quant}", flush=True)
    variables = {"params": vp}
    if quant_coll is not None:
        variables["quant"] = quant_coll

    def one_chunk(vv, m_c, s_c):
        return vunet.apply(vv, list(m_c), s_c,
                           method=vunet.transfer_cached)

    m0 = tuple(m[0] for m in m_chunked)
    inv = conv_inventory(one_chunk, variables, m0, s_chunked[0])
    inv.sort(key=lambda r: -r["flops_each"] * r["count"])
    total_flops = sum(r["flops_each"] * r["count"] for r in inv)
    print(f"{len(inv)} distinct convs, "
          f"{sum(r['count'] for r in inv)} total, "
          f"{total_flops / 1e9:.2f} GFLOP/chunk", flush=True)

    # isolated floor per distinct conv
    floor_s = 0.0
    for r in inv:
        dt = time_conv(r)
        r["isolated_us"] = round(dt * 1e6, 1)
        r["isolated_tflops"] = round(r["flops_each"] / dt / 1e12, 2)
        floor_s += dt * r["count"]
        print(f"  {r['lhs']}x{r['rhs']}->{r['out']} s{r['strides']} "
              f"x{r['count']}: {r['isolated_us']}us "
              f"{r['isolated_tflops']}TF/s", flush=True)
        del r["_params"]

    # full synth stage, same protocol as serving_gap_audit stage 3
    def synth_loop(vv, m_chunked, s_chunked, k0):
        def synth_chunk(args_):
            m_c, s_c = args_
            return vunet.apply(vv, list(m_c), s_c,
                               method=vunet.transfer_cached)

        def body(i, carry):
            acc, s, k = carry
            frames = jax.lax.map(synth_chunk, (m_chunked, s))
            d = jnp.mean(frames.astype(jnp.float32)) * 1e-6
            return (acc + d, s + d.astype(s.dtype),
                    jax.random.fold_in(k, i))

        acc, _, _ = jax.lax.fori_loop(0, N_ITERS, body,
                                      (jnp.zeros(()), s_chunked, k0))
        return acc

    key = jax.random.PRNGKey(1)
    compiled = jax.jit(synth_loop).lower(variables, m_chunked, s_chunked,
                                         key).compile()
    float(compiled(variables, m_chunked, s_chunked, key))
    times = []
    for r_ in range(3):
        t0 = time.perf_counter()
        float(compiled(variables, m_chunked, s_chunked,
                       jax.random.fold_in(key, r_)))
        times.append(time.perf_counter() - t0)
    synth_ms = min(times) / N_ITERS * 1e3

    floor_ms = floor_s * n_chunks * 1e3
    envelope_true = total_flops * n_chunks / (floor_s * n_chunks) / 1e12
    summary = {
        "chunk": cs, "n_chunks": n_chunks,
        "synth_ms_per_run": round(synth_ms, 2),
        "conv_floor_ms_per_run": round(floor_ms, 2),
        "frac_of_conv_floor": round(floor_ms / synth_ms, 4),
        "conv_flops_per_run_g": round(total_flops * n_chunks / 1e9, 2),
        "envelope_true_tflops": round(envelope_true, 2),
        "synth_achieved_tflops": round(
            total_flops * n_chunks / (synth_ms / 1e3) / 1e12, 2),
        "note": "conv floor = sum over the TRUE conv inventory of each "
                "conv's isolated best-case XLA time at identical "
                "shape/batch; envelope_true replaces the 3-shape 22 TF/s "
                "proxy (which over-weighted the most efficient shapes)",
    }
    print(json.dumps(summary), flush=True)

    profile = None
    if not args.skip_profile:
        tdir = "/tmp/per_conv_trace"
        runs = 2
        with trace(tdir):
            for r_ in range(runs):
                float(compiled(variables, m_chunked, s_chunked,
                               jax.random.fold_in(key, 10 + r_)))
        rows = device_op_table(tdir, runs=runs)
        buckets, conv_by_shape, detail = classify_profile(rows, runs)
        # profiler run covers N_ITERS loop iterations per call
        per_run = {k: round(v / N_ITERS, 1) for k, v in buckets.items()}
        for d_ in detail:
            d_["us_per_run"] = round(d_["us_per_run"] / N_ITERS, 1)
        profile = {
            "self_time_us_per_run": per_run,
            "conv_us_by_out_shape": {
                k: round(v / N_ITERS, 1)
                for k, v in sorted(conv_by_shape.items(),
                                   key=lambda kv: -kv[1])},
            "top_ops": detail[:25],
        }
        print(json.dumps(per_run), flush=True)

    path = args.out
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    sect = "per_conv" if args.quant == "none" else \
        f"per_conv_{args.quant}_hw{args.quant_max_hw}"
    data[sect] = {"inventory": inv, "summary": summary,
                        "profile": profile,
                        "batch": B, "spatial": S, "length": T}
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
