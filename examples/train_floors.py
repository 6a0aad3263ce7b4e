"""Matmul+conv floor audit for the TRAINING bench rows (VERDICT r4
item 4: "every row a denominator").

Same methodology as examples/per_conv_audit.py but generalized to the
ops that dominate the sequence-model train steps — ``dot_general`` as
well as ``conv_general_dilated`` — and scan-aware: XLA's cost_analysis
counts a while/scan BODY ONCE, so the jaxpr walk multiplies every op
inside a ``lax.scan`` by its static ``length`` (the LSTM time loops are
where almost all of these steps' FLOPs live).

For each workload (behavior-cVAE train step, MTVAE train step, 630M
flow train step — the exact programs bench.py times, via the shared
builders in train/bench_harness.py):

  1. extract the op inventory (shapes, dtypes, multiplicity incl. scan
     trip counts) from the step's jaxpr — forward AND backward, since
     the step contains value_and_grad;
  2. time each distinct op ISOLATED at identical shape with
     overhead-cancelling two-point feedback loops;
  3. floor = sum(count * isolated time); envelope = total FLOPs / floor.

Writes TRAIN_FLOORS.json, which bench.py reads for the train rows'
``frac_of_envelope`` denominators.

Run on the chip: python examples/train_floors.py [--target all]
"""
import argparse
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
from jax import lax


# ---------------------------------------------------------------- inventory

def _walk(jaxpr, mult, out):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("dot_general", "conv_general_dilated"):
            out.append((eqn, mult))
        sub = mult * int(eqn.params["length"]) if name == "scan" else mult
        for v in eqn.params.values():
            vs = v if isinstance(v, (list, tuple)) else (v,)
            for u in vs:
                if hasattr(u, "jaxpr"):
                    _walk(u.jaxpr, sub, out)
                elif hasattr(u, "eqns"):
                    _walk(u, sub, out)


def op_inventory(fn, *args):
    """Distinct dot/conv configs with scan-aware multiplicity."""
    eqns = []
    _walk(jax.make_jaxpr(fn)(*args).jaxpr, 1, eqns)
    inv = {}
    for eqn, mult in eqns:
        lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
        out = eqn.outvars[0].aval
        p = eqn.params
        if eqn.primitive.name == "dot_general":
            dn = p["dimension_numbers"]
            (lc, rc), _ = dn
            k = float(np.prod([lhs.shape[d] for d in lc])) or 1.0
            flops = 2.0 * float(np.prod(out.shape)) * k
            sig = ("dot", tuple(lhs.shape), tuple(rhs.shape),
                   str(lhs.dtype), str(rhs.dtype), str(out.dtype),
                   str(dn))
        else:
            dn = p["dimension_numbers"]
            cin_g = rhs.shape[dn.rhs_spec[1]]
            k_spatial = float(np.prod([rhs.shape[d]
                                       for d in dn.rhs_spec[2:]]))
            flops = 2.0 * float(np.prod(out.shape)) * cin_g * k_spatial
            sig = ("conv", tuple(lhs.shape), tuple(rhs.shape),
                   str(lhs.dtype), str(rhs.dtype), str(out.dtype),
                   tuple(p["window_strides"]),
                   tuple(tuple(q) for q in p["padding"]),
                   tuple(p["lhs_dilation"]), tuple(p["rhs_dilation"]))
        if sig not in inv:
            inv[sig] = {"kind": sig[0], "lhs": list(lhs.shape),
                        "rhs": list(rhs.shape), "out": list(out.shape),
                        "dtype": str(lhs.dtype),
                        "rhs_dtype": str(rhs.dtype),
                        "out_dtype": str(out.dtype),
                        "flops_each": flops,
                        "count": 0, "_eqn": eqn}
        inv[sig]["count"] += mult
    return sorted(inv.values(),
                  key=lambda r: -r["flops_each"] * r["count"])


# ---------------------------------------------------------------- timing

def _run_op(eqn, x, w):
    p = eqn.params
    if eqn.primitive.name == "dot_general":
        return lax.dot_general(
            x, w, p["dimension_numbers"], precision=p["precision"],
            preferred_element_type=p["preferred_element_type"])
    return lax.conv_general_dilated(
        x, w, p["window_strides"], p["padding"],
        lhs_dilation=p["lhs_dilation"], rhs_dilation=p["rhs_dilation"],
        dimension_numbers=p["dimension_numbers"],
        feature_group_count=p["feature_group_count"],
        precision=p["precision"],
        preferred_element_type=p["preferred_element_type"])


def time_op(row, target_s=0.08):
    """Two-point feedback-loop timing (core.timing.two_point_op_time)."""
    from behavior_driven_video_synthesis_tpu.core.timing import (
        make_operand,
        two_point_op_time,
    )

    eqn = row["_eqn"]
    x = make_operand(row["lhs"], eqn.invars[0].aval.dtype)
    w = make_operand(row["rhs"], eqn.invars[1].aval.dtype)
    return two_point_op_time(lambda x, w: _run_op(eqn, x, w), x, w,
                             row["flops_each"], target_s=target_s)


# ---------------------------------------------------------------- workloads

def behavior_workload():
    from behavior_driven_video_synthesis_tpu.train.bench_harness import (
        build_behavior_bench_step,
    )

    state, step, batch = build_behavior_bench_step()
    key = jax.random.PRNGKey(0)
    n_params = sum(
        int(np.sum([x.size for x in jax.tree_util.tree_leaves(m.params)]))
        for m in (state.net, state.regressor, state.cls_action,
                  state.cls_action2, state.cls_beta))
    return (lambda s, b, k: step(s, b, k)[1]["loss"],
            (state, batch, key),
            {"batch": batch["keypoints"].shape[0], "n_params": n_params})


def mtvae_workload():
    from behavior_driven_video_synthesis_tpu.train.bench_harness import (
        build_mtvae_bench_step,
    )

    state, step, batch, _tx = build_mtvae_bench_step()
    key = jax.random.PRNGKey(0)
    n_params = int(np.sum([x.size for x in
                           jax.tree_util.tree_leaves(state.net.params)]))
    return (lambda s, b, k: step(s, b, k)[1]["loss"],
            (state, batch, key),
            {"batch": batch["keypoints"].shape[0], "n_params": n_params})


def flow_workload():
    """The bench.py flow row's exact program body (one train step of the
    630M-param flow, B=64)."""
    import optax
    from behavior_driven_video_synthesis_tpu.models.flows import (
        LatentFlow,
        flow_loss,
    )

    B, HID = 64, 1024
    flow = LatentFlow(flow_in_channels=HID, flow_mid_channels=2 * HID,
                      n_flows=15)
    key = jax.random.PRNGKey(0)
    b = jax.random.normal(key, (B, HID))
    fv = flow.init({"params": key}, b)
    tx = optax.adam(1e-4)
    opt = tx.init(fv["params"])
    buffers = fv["buffers"]

    def one_step(params, opt, b):
        def loss_fn(p):
            z, logdet = flow.apply({"params": p, "buffers": buffers}, b)
            return flow_loss(z, logdet)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt2 = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt2, loss

    n_params = int(np.sum([x.size for x in
                           jax.tree_util.tree_leaves(fv["params"])]))
    return (lambda p, o, bb: one_step(p, o, bb)[2],
            (fv["params"], opt, b), {"batch": B, "n_params": n_params})


WORKLOADS = {
    "behavior_train": behavior_workload,
    "mtvae_train": mtvae_workload,
    "flow_train": flow_workload,
}


# v5e HBM bandwidth (public spec ~819 GB/s); only used for the roofline
# floor term — override for other parts
HBM_GBPS = float(os.environ.get("FLOORS_HBM_GBPS", "819"))


def _bytes_of(shape, dtype):
    return float(np.prod(shape)) * np.dtype(dtype).itemsize


def roofline_floor(inv, n_params, state_dtype_bytes=4):
    """HBM-traffic lower bound per step.

    The isolated per-op timing UNDERSTATES streaming cost for ops inside
    a scan: the timing loop's weight operand is loop-invariant, so XLA
    keeps it VMEM-resident across trips, while the real scan re-streams
    every timestep's weights from HBM.  Per op the roofline term is
    (lhs + rhs + out bytes) / BW x count (scan-expanded count => the
    re-streaming is charged), and the optimizer adds 7 passes over the
    param/state bytes (read g, p, m, v; write p, m, v — Adam)."""
    op_bytes = sum(
        (_bytes_of(r["lhs"], r["dtype"])
         + _bytes_of(r["rhs"], r.get("rhs_dtype", r["dtype"]))
         + _bytes_of(r["out"], r.get("out_dtype", r["dtype"])))
        * r["count"] for r in inv)
    adam_bytes = 7.0 * n_params * state_dtype_bytes
    return (op_bytes + adam_bytes) / (HBM_GBPS * 1e9), op_bytes, adam_bytes


def audit(name, build):
    fn, args, meta = build()
    inv = op_inventory(fn, *args)
    total_flops = sum(r["flops_each"] * r["count"] for r in inv)
    n_params = meta.pop("n_params", 0)
    print(f"{name}: {len(inv)} distinct ops, "
          f"{sum(r['count'] for r in inv)} total (scan-expanded), "
          f"{total_flops / 1e9:.2f} GFLOP/step", flush=True)
    floor_s = 0.0
    for r in inv:
        dt = time_op(r)
        r["isolated_us"] = round(dt * 1e6, 2)
        r["isolated_tflops"] = round(r["flops_each"] / dt / 1e12, 2)
        floor_s += dt * r["count"]
        print(f"  {r['kind']} {r['lhs']}x{r['rhs']}->{r['out']} "
              f"[{r['dtype']}] x{r['count']}: {r['isolated_us']}us "
              f"{r['isolated_tflops']}TF/s", flush=True)
        del r["_eqn"]
    hbm_s, op_bytes, adam_bytes = roofline_floor(inv, n_params)
    binding_s = max(floor_s, hbm_s)
    summary = {
        **meta,
        "n_params": n_params,
        "flops_per_step_g": round(total_flops / 1e9, 2),
        "op_floor_ms_per_step": round(floor_s * 1e3, 3),
        "hbm_floor_ms_per_step": round(hbm_s * 1e3, 3),
        "hbm_op_gb": round(op_bytes / 1e9, 3),
        "hbm_adam_gb": round(adam_bytes / 1e9, 3),
        "floor_ms_per_step": round(binding_s * 1e3, 3),
        "binding": "hbm" if hbm_s > floor_s else "compute",
        "envelope_tflops": round(total_flops / binding_s / 1e12, 2),
        "note": ("floor = max(isolated-op floor, HBM roofline) over the "
                 "step's scan-expanded dot+conv inventory (fwd + bwd). "
                 "The roofline charges every scan trip's operand "
                 "re-streaming plus 7 Adam passes over the param bytes — "
                 "the isolated-op timings alone keep loop-invariant "
                 "weights VMEM-resident and understate a weight-bound "
                 "step's true floor.  cost_analysis is NOT used (counts "
                 "scan bodies once)."),
    }
    print(json.dumps({name: summary}), flush=True)
    return {"summary": summary, "inventory": inv}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="all",
                    choices=["all"] + list(WORKLOADS))
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "TRAIN_FLOORS.json"))
    args = ap.parse_args()
    targets = list(WORKLOADS) if args.target == "all" else [args.target]
    data = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            data = json.load(f)
    data["device"] = jax.devices()[0].device_kind
    for t in targets:
        data[t] = audit(t, WORKLOADS[t])
    with open(args.out, "w") as f:
        json.dump(data, f, indent=1)
    print("wrote", os.path.abspath(args.out))


if __name__ == "__main__":
    main()
