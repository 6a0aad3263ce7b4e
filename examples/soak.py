"""Unattended production-config soak (VERDICT r4 item 6): long-run
training stability evidence on the chip.

Every prior chip measurement is a <=10-step timing loop or a <=4k-step
ablation; the reference schedules are 150k iters (cvbae) / 50 epochs
(behavior).  This harness runs the two production train steps unattended
for thousands of steps and records the deliverability signals:

  * zero recompiles after warmup — asserted via jax's compilation
    counters (monitoring events 'jax_compilations_cache_uses' would need
    the internal registry; instead we assert the step's jit cache size
    stays 1 via step_fn._cache_size()),
  * step-time p50 / p90 / p99 per 1k-step window (drift or a relay
    wedge shows up as a fat tail),
  * flat device memory: live HBM bytes polled every window,
  * one mid-run checkpoint/save + restore, then continue — the restored
    state must keep training at the same rate and the post-restore loss
    must continue finitely from the restored value.

Workloads (synthetic data, exact production shapes via the shared bench
harness builders — the same programs bench.py times):
  cvbae:    B=12 256px shipped production default, ~N_CVBAE steps
  behavior: B=64 T=50 HID=1024 full step, ~N_BEHAVIOR steps

Writes SOAK.json.  Run: python examples/soak.py [--cvbae-steps 10000]
[--behavior-steps 5000]
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


def _hbm_live_bytes():
    try:
        stats = jax.devices()[0].memory_stats()
        return int(stats.get("bytes_in_use", -1))
    except Exception:
        return -1


def _pct(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def soak_workload(name, state, step_fn, batch, n_steps, chunk,
                  loss_of, save_restore_at=None):
    """Run n_steps in `chunk`-step jitted fori_loop dispatches; time each
    dispatch; optionally round-trip the state through a checkpoint at
    step save_restore_at."""
    import shutil

    from behavior_driven_video_synthesis_tpu.core.checkpoint import (
        CheckpointManager,
    )

    key = jax.random.PRNGKey(0)

    def loop(state, batch, k0):
        def body(i, carry):
            st, k = carry
            st, _ = step_fn(st, batch, k)
            return st, jax.random.fold_in(k, i)
        st, k = jax.lax.fori_loop(0, chunk, body, (state, k0))
        return st, k

    jitted = jax.jit(loop, donate_argnums=(0,))
    compiled0 = None
    windows = []
    chunk_times = []
    events = []
    t_start = time.time()
    done = 0
    k = key
    # one full-metrics step for loss telemetry (separate, undonated)
    metrics_step = jax.jit(lambda s, b, kk: step_fn(s, b, kk)[1])

    while done < n_steps:
        t0 = time.perf_counter()
        state, k = jitted(state, batch, k)
        jax.block_until_ready(state)
        float(loss_of(state))            # force through the relay
        dt = time.perf_counter() - t0
        if compiled0 is None:
            compiled0 = dt               # warmup dispatch incl. compile
            events.append({"event": "warmup", "s": round(dt, 2)})
        else:
            chunk_times.append(dt)
        done += chunk

        if save_restore_at and done >= save_restore_at:
            save_restore_at = None
            ck_dir = f"/tmp/soak_ckpt_{name}"
            shutil.rmtree(ck_dir, ignore_errors=True)
            mgr = CheckpointManager(ck_dir, max_to_keep=1)
            host_state = jax.device_get(state)
            loss_before = float(metrics_step(
                state, batch, jax.random.fold_in(k, 999))["loss"])
            t0 = time.perf_counter()
            mgr.save(done, host_state, force=True)
            restored, _step = mgr.restore_latest(host_state)
            mgr.close()
            state = jax.device_put(restored)
            loss_after = float(metrics_step(
                state, batch, jax.random.fold_in(k, 999))["loss"])
            rel = abs(loss_before - loss_after) / (abs(loss_before) + 1e-9)
            events.append({
                "event": "mid-run checkpoint save+restore",
                "at_step": done, "s": round(time.perf_counter() - t0, 2),
                "loss_before": loss_before, "loss_after": loss_after,
                "identical": bool(np.isfinite(loss_before)
                                  and np.isfinite(loss_after)
                                  and rel < 1e-4),
            })

        if len(chunk_times) and len(chunk_times) % max(
                1, (1000 // chunk)) == 0:
            per_step = [t / chunk for t in chunk_times[-(1000 // chunk):]]
            windows.append({
                "steps": done,
                "p50_ms": round(_pct(per_step, 50) * 1e3, 2),
                "p90_ms": round(_pct(per_step, 90) * 1e3, 2),
                "p99_ms": round(_pct(per_step, 99) * 1e3, 2),
                "hbm_live_mb": round(_hbm_live_bytes() / 2 ** 20, 1),
                "loss": float(metrics_step(
                    state, batch, jax.random.fold_in(k, 4242))["loss"]),
            })
            print(f"{name} {windows[-1]}", flush=True)

    per_step_all = [t / chunk for t in chunk_times]
    final_loss = float(metrics_step(
        state, batch, jax.random.fold_in(k, 31337))["loss"])
    return {
        "steps": done,
        "chunk": chunk,
        "wall_s": round(time.time() - t_start, 1),
        "warmup_s": round(compiled0 or 0.0, 2),
        "rate_per_s": round(done / max(sum(chunk_times), 1e-9), 2),
        "p50_ms": round(_pct(per_step_all, 50) * 1e3, 2),
        "p90_ms": round(_pct(per_step_all, 90) * 1e3, 2),
        "p99_ms": round(_pct(per_step_all, 99) * 1e3, 2),
        "max_chunk_s": round(max(chunk_times), 2),
        "recompiles_after_warmup": int(
            jitted._cache_size() - 1) if hasattr(jitted, "_cache_size")
        else None,
        "hbm_first_mb": windows[0]["hbm_live_mb"] if windows else None,
        "hbm_last_mb": windows[-1]["hbm_live_mb"] if windows else None,
        "final_loss": final_loss,
        "finite": bool(np.isfinite(final_loss)),
        "windows": windows,
        "events": events,
    }


def build_flow_soak():
    """The production flow STAGE step (630M flow NLL-trained on latents
    inferred from a frozen behavior net — train/flow.py, the program
    behavior_net's only_flow mode runs for 5 epochs), adapted to the
    3-arg soak protocol: the frozen net params ride inside the batch so
    they stay a jit ARGUMENT (closing over them would bake ~120 MB of
    constants into the HLO — the capture trap in the verify notes)."""
    import optax
    from behavior_driven_video_synthesis_tpu.models import (
        ResidualBehaviorNet,
    )
    from behavior_driven_video_synthesis_tpu.models.flows import LatentFlow
    from behavior_driven_video_synthesis_tpu.train.flow import (
        create_flow_state,
        make_flow_train_step,
    )

    B, T, K, HID = 64, 50, 48, 1024
    net = ResidualBehaviorNet(n_kps=K, dim_hidden_b=HID)
    flow = LatentFlow(flow_in_channels=HID, flow_mid_channels=2 * HID,
                      n_flows=15)
    key = jax.random.PRNGKey(0)
    kps = jax.random.normal(jax.random.fold_in(key, 1), (B, T + 1, K))
    net_params = net.init({"params": key, "sample": key},
                          kps[:, :-1], kps[:, :-1], T)["params"]
    b0 = jax.random.normal(jax.random.fold_in(key, 2), (B, HID))
    state = create_flow_state(key, flow, optax.adam(1e-4), b0)
    raw_step = make_flow_train_step(net, flow, optax.adam(1e-4), T)

    def step(st, batch, k):
        st, m = raw_step(st, batch["_net"], {"keypoints": batch["kps"]}, k)
        return st, {"loss": m["flow_loss"], **m}

    batch = {"kps": kps, "_net": net_params}
    return state, step, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cvbae-steps", type=int, default=10000)
    ap.add_argument("--behavior-steps", type=int, default=5000)
    ap.add_argument("--flow-steps", type=int, default=2000)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--only", default=None,
                    help="substring filter on workload names; merges into "
                         "an existing --out")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "SOAK.json"))
    args = ap.parse_args()

    from behavior_driven_video_synthesis_tpu.train.bench_harness import (
        build_behavior_bench_step,
        build_cvbae_bench_step,
    )

    out = {}
    if args.only and os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    out["device"] = jax.devices()[0].device_kind
    out["started_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())

    def want(name):
        return args.only is None or args.only in name

    if want("cvbae"):
        print("=== cvbae soak (shipped production default, B=12/256px) "
              "===", flush=True)
        state, step, batch = build_cvbae_bench_step(12, 256)
        out["cvbae"] = soak_workload(
            "cvbae", state, step, batch, args.cvbae_steps, args.chunk,
            loss_of=lambda s: jnp.sum(s.gamma),
            save_restore_at=args.cvbae_steps // 2)

    if want("behavior"):
        print("=== behavior soak (B=64/T=50/HID=1024 full step) ===",
              flush=True)
        state, step, batch = build_behavior_bench_step()
        out["behavior"] = soak_workload(
            "behavior", state, step, batch, args.behavior_steps,
            args.chunk, loss_of=lambda s: jnp.sum(s.gamma),
            save_restore_at=args.behavior_steps // 2)

    if want("flow"):
        print("=== flow soak (630M flow stage, B=64) ===", flush=True)
        state, step, batch = build_flow_soak()
        out["flow"] = soak_workload(
            "flow", state, step, batch, args.flow_steps, args.chunk,
            loss_of=lambda s: jnp.sum(s.step),
            save_restore_at=args.flow_steps // 2)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(args.out))


if __name__ == "__main__":
    main()
