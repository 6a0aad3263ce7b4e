"""Benchmark: the end-to-end behavior-transfer video program at 256px.

Default (BENCH_MODE=round): ONE JSON line whose headline is the full
compiled serving pipeline — flow inverse -> 50-step decoder rollout ->
unnormalize -> camera projection -> on-device stickman raster -> VUNet
synthesis — frames/sec/chip, run with the documented TPU serving preset
(int8_static + quant_max_hw 128 = `bdvs-generate --preset tpu-serving`;
trained-ckpt numerics rel-L2 0.003 / SSIM 0.9995 vs f32), PLUS
`extra_metrics` with the bf16 pipeline (continuity with earlier rounds)
and the two expensive training workloads (256px cvbae train step at the
reference production config, and the 630M-param flow train step).  Every
entry carries achieved TFLOP/s from XLA's cost_analysis and an MFU figure
against the chip's bf16 peak, so the numbers are anchored to the hardware
envelope rather than free-floating.

Other modes: BENCH_MODE=pipeline|train|behavior|behaviortrain|mtvaetrain|
flowtrain|vunet emit that single metric only.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N,
   "achieved_tflops": N, "mfu": N, "extra_metrics": [...]}

vs_baseline is measured against the BASELINE.json north-star target of
2,000 256px frames/sec/chip (the reference publishes no throughput numbers —
SURVEY.md §6 — so the target is the baseline contract).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

NORTH_STAR_FPS = 2000.0

# The measured XLA conv envelope for the VUNet du+dd serving mix on this
# chip, from `examples/per_conv_audit.py` (SERVING_GAP.json "per_conv",
# 2026-08-21): every one of the stage's 28 distinct convs timed ISOLATED
# at the exact serving shape/batch (chunk=125) with overhead-cancelling
# two-point timing — floor 476 ms/run over 33.27 TFLOP -> 69.86 TF/s.
# This replaces the r1-era 22 TF/s proxy, which was measured at B=8 where
# XLA's conv efficiency at these shapes is 3-7x lower (256^2xC32: 9.5
# TF/s at B=8 vs 50.98 at B=125).  The compiled stage actually runs at
# 1.16x this floor (in-graph overlap beats back-to-back isolated convs),
# so frac_of_envelope ~1 means speed-of-light for this conv mix.
CONV_ENVELOPE_TFLOPS = 69.86
CONV_ENVELOPE_NOTE = ("sum-of-isolated-conv floor over the TRUE du+dd "
                      "conv inventory at serving shapes (per_conv_audit, "
                      "SERVING_GAP.json per_conv)")

# Audited conv FLOPs of the serving path per generated frame (du+dd
# transfer_cached, 256px, jaxpr inventory: 4158.19 GFLOP per 125-frame
# chunk).  Used for the pipeline row's achieved_tflops: XLA
# cost_analysis counts the inner lax.map chunk body ONCE, so the r3
# numbers undercounted the pipeline's FLOPs by n_chunks (8x) — the real
# rate is ~81 TF/s, not 10.3.
CONV_FLOPS_PER_FRAME_G = 33.27

# The int8 serving preset's OWN conv envelope (per_conv_audit --quant
# int8_static --quant-max-hw 128, SERVING_GAP.json
# "per_conv_int8_static_hw128", 2026-08-21): the preset's true conv
# inventory (int8 convs at H<=128, bf16 at 256px) timed isolated at the
# exact serving shapes — 384.8 ms floor over 33.27 TFLOP -> 86.45 TF/s.
# Fixes VERDICT r4 weak #3's accounting gap: the int8 row previously
# divided by the BF16 floor.  The compiled int8 stage measured 1.002x
# this floor — exactly at its own conv speed-of-light.
CONV_ENVELOPE_INT8_TFLOPS = 86.45
CONV_ENVELOPE_INT8_NOTE = ("sum-of-isolated-conv floor over the int8 "
                           "preset's OWN conv inventory (per_conv_audit "
                           "--quant int8_static --quant-max-hw 128, "
                           "SERVING_GAP.json per_conv_int8_static_hw128)")

# Train-step conv envelope: total conv FLOPs of the cvbae step (fwd +
# dgrad + wgrad, B=12/256px) divided by the sum of each conv's isolated
# best-case XLA time at identical shape — measured by
# `examples/per_conv_audit.py --target cvbae_train`
# (CVBAE_RECONCILE.json "train_conv_floor").  Measured 2026-08-21 on the
# v5e chip with overhead-cancelling two-point timing: conv floor
# 84.6 ms/step over 414 convs (1790.6 GFLOP) at the shipped production
# default config -> 21.17 TF/s.
CVBAE_TRAIN_ENVELOPE_TFLOPS = 21.17
CVBAE_TRAIN_ENVELOPE_NOTE = (
    "XLA conv floor over the train step's full conv inventory "
    "(per_conv_audit --target cvbae_train, CVBAE_RECONCILE.json)")

# Dense bf16 peak FLOP/s by TPU generation (public spec sheets; v5e =
# "v5 litepod" device_kind "TPU v5 lite").  Used only for the MFU column.
_BF16_PEAK_TFLOPS = {
    "v5 lite": 197.0,
    "v5litepod": 197.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6": 918.0,
    "v3": 123.0,
    "v2": 46.0,
}


def _chip_peak_tflops():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for k, v in _BF16_PEAK_TFLOPS.items():
        if k in kind:
            return v
    return None


def _cost_flops(lowered_compiled):
    """Total FLOPs XLA's cost model assigns to a compiled executable."""
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _loop_flops(compiled, n_iters):
    """FLOPs actually executed by a timed fori_loop call: XLA's cost
    analysis counts a while-loop BODY ONCE (verified empirically: a
    fori_loop(8) over a matmul reports the single-matmul flop count), while
    the timed interval spans all n_iters iterations — scale accordingly."""
    body = _cost_flops(compiled)
    return body * n_iters if body else None


def _mfu_fields(flops_total, dt, envelope_tflops=None, envelope_note=None):
    """achieved TFLOP/s + MFU vs the chip's dense-bf16 peak — and, when the
    workload has a measured XLA envelope (the rate XLA's own best lowering
    of the dominant op reaches on this chip, ROADMAP item 3), the fraction
    of that envelope.  MFU vs paper-peak is misleading alone for these
    workloads: the hot convs run at small channel counts where the MXU's
    128 lanes are structurally underfilled, and the measured envelope is
    the honest ceiling."""
    if not flops_total or not dt:
        return {}
    tflops = flops_total / dt / 1e12
    out = {"achieved_tflops": round(tflops, 2)}
    peak = _chip_peak_tflops()
    if peak:
        out["mfu"] = round(tflops / peak, 4)
        out["peak_bf16_tflops"] = peak
    if envelope_tflops:
        out["envelope_tflops"] = envelope_tflops
        out["frac_of_envelope"] = round(tflops / envelope_tflops, 4)
        if envelope_note:
            out["envelope_note"] = envelope_note
    return out


def bench_pipeline(quant=None, quant_max_hw=None):
    """Full behavior-transfer program: flow sample -> rollout -> FK/project
    -> device stickman -> VUNet, ONE jit.  Production sizes.

    quant/quant_max_hw: explicit overrides (round mode passes these as
    parameters so a mid-bench exception can never leak int8 settings into
    a later sub-bench via os.environ); None falls back to BENCH_QUANT /
    BENCH_QUANT_MAX_HW for the single-mode CLI."""
    import numpy as np
    import jax
    import jax.numpy as jnp
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

    # Round-2 B sweep on the real v5e chip (honest feedback-loop timing,
    # chunked VUNet stage so HBM never blows up): B=8 1,994 f/s ->
    # B=16 2,018 -> B=20 2,361 -> B=24 2,289 -> B=28 2,033 -> B=32 2,036.
    # B=20 (125-frame chunks) is the knee; larger batches lose to HBM
    # pressure from the B*T stickman/frame tensors.
    B = int(os.environ.get("BENCH_BATCH", "20"))
    S = int(os.environ.get("BENCH_SPATIAL", "256"))
    T = int(os.environ.get("BENCH_LENGTH", "50"))
    # BENCH_QUANT=int8_static: PTQ-calibrated int8 serving convs on the
    # per-frame path (same params; ops/nn._conv_int8) — quality delta vs
    # bf16 measured by examples/quant_ablation.py.  "int8" = dynamic
    # scales (slower: extra max-reduce pass per conv).
    if quant is None:
        quant = os.environ.get("BENCH_QUANT", "none")
    # BENCH_QUANT_MAX_HW=128: leave convs ABOVE this input height in bf16
    # (top-scale quantize passes cost ~what the int8 MXU rate saves there,
    # and the output-adjacent convs are the most quality-sensitive)
    if quant_max_hw is None:
        quant_max_hw = int(os.environ.get("BENCH_QUANT_MAX_HW", "0"))
    # BENCH_UPSAMPLE=transpose: lower subpixel upsamples as transposed
    # convs (identical numerics, skips depth_to_space relayout copies)
    ups_transpose = os.environ.get("BENCH_UPSAMPLE", "") == "transpose"
    HID, K_FULL, K_USE = 1024, 51, 48

    jm = detailed_joint_model(world_coords=True)
    behavior = ResidualBehaviorNet(n_kps=K_USE, dim_hidden_b=HID,
                                   dtype=jnp.bfloat16)
    vunet = VUNet(spatial_size=S, nf_start=32, nf_max=128, variant="alter",
                  quant=quant, quant_max_hw=quant_max_hw,
                  upsample_transpose=ups_transpose, dtype=jnp.bfloat16)
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
                                    flow_model=flow,
                                    vunet_chunk=int(os.environ.get(
                                        "BENCH_VUNET_CHUNK", "128")))
    params = {"behavior": bp, "vunet": vp, "flow": fv}
    z = jax.random.normal(key, (B, HID))
    x_start = jnp.zeros((B, K_USE))
    extr = jnp.tile(jnp.asarray(
        np.hstack([np.eye(3), [[0], [0], [4.0]]]), jnp.float32), (B, 1, 1))
    intr = jnp.tile(jnp.asarray([1145.0, 500.0, 1143.0, 500.0]), (B, 1))
    imsize = jnp.full((B, 2), 1000.0)

    if quant == "int8_static":
        # one PTQ calibration pass on a 2-video slice of the same input
        # distribution (small batch: calibration runs unchunked)
        params["vunet_quant"] = pipe.calibrate(
            params, z[:2], x_start[:2], app[:2], extr[:2], intr[:2],
            imsize[:2], key, length=T)

    n_iters = int(os.environ.get("BENCH_ITERS", "8"))

    def loop(params, z, x_start, app, extr, intr, imsize, k0):
        def body(i, carry):
            acc, z, k = carry
            frames = pipe.generate(params, z, x_start, app, extr, intr,
                                   imsize, k, length=T)["frames"]
            d = jnp.mean(frames.astype(jnp.float32)) * 1e-6
            # feed the output back into the next iteration's input so a
            # loop-invariant body can never be hoisted out of the timing
            return (acc + d, z + d, jax.random.fold_in(k, i))
        acc, _, _ = jax.lax.fori_loop(0, n_iters, body,
                                      (jnp.zeros(()), z, k0))
        return acc

    args = (params, z, x_start, app, extr, intr, imsize)
    compiled = jax.jit(loop).lower(*args, key).compile()
    float(compiled(*args, key))  # warm
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        float(compiled(*args, jax.random.fold_in(key, r)))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    fps = B * T * n_iters / dt
    if S == 256:
        # audited conv FLOPs per frame (NOT cost_analysis: it counts the
        # inner lax.map chunk body once -> 8x undercount at these shapes).
        # The audited constant and the envelope denominator are both
        # 256px/nf32-128 figures — at other BENCH_SPATIAL fall back to
        # cost_analysis (which may undercount chunked programs) and emit
        # no envelope fields rather than wrong ones.
        flops_total = B * T * n_iters * CONV_FLOPS_PER_FRAME_G * 1e9
        # the envelope denominator must match the program's OWN conv mix:
        # the int8 preset runs a different (faster) inventory than bf16
        if quant and quant != "none":
            env, env_note = (CONV_ENVELOPE_INT8_TFLOPS,
                             CONV_ENVELOPE_INT8_NOTE)
        else:
            env, env_note = CONV_ENVELOPE_TFLOPS, CONV_ENVELOPE_NOTE
        mfu = _mfu_fields(flops_total, dt, envelope_tflops=env,
                          envelope_note=env_note)
        mfu["flops_note"] = ("conv-only audited jaxpr-inventory FLOPs "
                             "(33.27 GFLOP/frame at 256px serving); NOT "
                             "comparable to cost_analysis-based mfu rows")
    else:
        mfu = _mfu_fields(_loop_flops(compiled, n_iters), dt)
        mfu["flops_note"] = ("cost_analysis FLOPs (undercounts inner "
                             "chunk loops); audited per-frame constant "
                             "only valid at 256px")
    return {
        "metric": f"behavior_transfer_pipeline_{S}px_e2e",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / NORTH_STAR_FPS, 4),
        **mfu,
    }


def bench_cvbae_train():
    """cvbae training-step throughput at the reference's production config
    (256px, nf 32..128, batch 12, perceptual + KL + gamma controller;
    reference config/shape_and_pose_net.yaml:44-58, 150k iters)."""
    import jax
    import jax.numpy as jnp
    from behavior_driven_video_synthesis_tpu.train.bench_harness import (
        build_cvbae_bench_step,
    )

    B = int(os.environ.get("BENCH_BATCH", "12"))
    S = int(os.environ.get("BENCH_SPATIAL", "256"))
    # Measure the SHIPPED production default (configs/shape_and_pose_net.
    # yaml): dropout 0.05 + trained regressor + laplacian perceptual +
    # rbg dropout keys.  BENCH_CVBAE_VGG=1 restores the r3-era row config
    # (bf16 random-VGG, no regressor) for cross-round comparison; the
    # full config<->rate map lives in CVBAE_RECONCILE.json.
    use_vgg = os.environ.get("BENCH_CVBAE_VGG", "0") == "1"
    key = jax.random.PRNGKey(0)
    state, step, batch = build_cvbae_bench_step(
        B, S, regressor_on=not use_vgg,
        features=jnp.bfloat16 if use_vgg else "laplacian")

    n_iters = int(os.environ.get("BENCH_ITERS", "10"))
    # state donation + scalar-fetch completion + min-of-3: the shared
    # protocol (core.timing.time_step_loop; undonated measured ~20%
    # slower at the 630M scale, and the real drivers donate)
    from behavior_driven_video_synthesis_tpu.core.timing import (
        time_step_loop,
    )

    dt, _, compiled = time_step_loop(step, state, batch, key, n_iters,
                                     fetch=lambda st: jnp.sum(st.gamma))
    ips = B * n_iters / dt
    row = {
        "metric": f"cvbae_{S}px_train_throughput",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "config": ("r3-era row: bf16 random-VGG, no regressor" if use_vgg
                   else "shipped production default: laplacian perceptual "
                        "+ trained regressor + dropout 0.05 (rbg keys)"),
    }
    if B == 12 and S == 256 and not use_vgg:
        # anchor: BENCH_r04's recording of this SAME config (shipped
        # production default incl. dropout, 109.91 img/s) —
        # like-for-like ratio-to-last-known-good (VERDICT r4 weak #6;
        # the old anchor divided by the r2 dropout-OFF harness, a
        # cross-config ratio).  Full config<->rate map in
        # CVBAE_RECONCILE.json; the round-5 Pallas fused act+dropout
        # arm measured SLOWER (100.5) and the dropout representation
        # question is closed (ops/pallas/elu_dropout.py docstring).
        row["vs_baseline"] = round(ips / 109.91, 4)
        row["baseline_note"] = ("ratio to BENCH_r04's same-config "
                                "recording (109.91 img/s, shipped "
                                "production default incl. dropout); "
                                "config map in CVBAE_RECONCILE.json")
    else:
        row["vs_baseline"] = None
        row["baseline_note"] = ("non-default config (B/S/VGG override); "
                                "no cross-config ratio")
    row.update(
        _mfu_fields(
            _loop_flops(compiled, n_iters), dt,
            # the conv floor was audited at the default B=12/256px
            # shipped config; other configs get raw tflops only
            envelope_tflops=(CVBAE_TRAIN_ENVELOPE_TFLOPS
                             if (B == 12 and S == 256 and not use_vgg)
                             else None),
            envelope_note=CVBAE_TRAIN_ENVELOPE_NOTE))
    return row


def _train_floor(name):
    """Envelope fields for a training row from TRAIN_FLOORS.json — the
    committed examples/train_floors.py audit artifact (scan-expanded
    dot+conv inventory, isolated two-point timings).  None when the
    artifact is missing or lacks the workload."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "TRAIN_FLOORS.json")
    try:
        with open(path) as f:
            return json.load(f)[name]["summary"]
    except (OSError, KeyError, ValueError):
        return None


def _floor_mfu(floor, dt, n_iters, fallback_flops=None, batch=None):
    """MFU fields for a train row: FLOPs from the audited scan-expanded
    inventory (cost_analysis counts scan bodies ONCE and would undercount
    the LSTM loops T-fold), envelope from the isolated-op floor.

    ``batch``: the row's actual batch — the audit's FLOPs/floor are only
    valid at the batch they were audited at, so a BENCH_BATCH override
    falls back to cost_analysis instead of silently emitting wrong
    per-FLOP numbers (the accounting trap VERDICT r4 weak #6 closed for
    the cvbae row)."""
    if floor is not None and batch is not None \
            and floor.get("batch") not in (None, batch):
        floor = None
    if floor is None:
        mfu = _mfu_fields(fallback_flops, dt)
        mfu["flops_note"] = ("cost_analysis FLOPs (undercounts scan "
                             "bodies); run examples/train_floors.py for "
                             "the audited inventory + envelope")
        return mfu
    flops_total = floor["flops_per_step_g"] * 1e9 * n_iters
    mfu = _mfu_fields(flops_total, dt,
                      envelope_tflops=floor["envelope_tflops"],
                      envelope_note=floor["note"])
    mfu["flops_note"] = ("audited scan-expanded dot+conv inventory "
                         "(TRAIN_FLOORS.json)")
    return mfu


def bench_behavior_train():
    """Behavior-cVAE train-step throughput at the reference production
    scale (batch 64, dim_hidden_b 1024, 50-frame windows — config/
    behavior_net.yaml:26,35): the FULL step (net + 5 adversarial-regressor
    inner updates + 3 probe classifiers + gamma controller)."""
    import jax
    import jax.numpy as jnp
    from behavior_driven_video_synthesis_tpu.train.bench_harness import (
        build_behavior_bench_step,
    )

    from behavior_driven_video_synthesis_tpu.core.timing import (
        time_step_loop,
    )

    B = int(os.environ.get("BENCH_BATCH", "64"))
    state, step, batch = build_behavior_bench_step(B=B)
    key = jax.random.PRNGKey(0)
    n_iters = int(os.environ.get("BENCH_ITERS", "10"))
    dt, _, _c = time_step_loop(step, state, batch, key, n_iters,
                               fetch=lambda st: jnp.sum(st.gamma))
    sps = B * n_iters / dt
    row = {
        "metric": "behavior_cvae_train_throughput",
        "value": round(sps, 2),
        "unit": "sequences/sec/chip",
        **_floor_mfu(_train_floor("behavior_train"), dt, n_iters,
                     fallback_flops=_loop_flops(_c, n_iters), batch=B),
    }
    if B == 64:
        # anchor: this row's first chip measurement (round 5) — ratio
        # reads "vs last known good" from r5 on
        row["vs_baseline"] = round(sps / 8691.69, 4)
        row["baseline_note"] = ("ratio to the round-5 first chip "
                                "recording (8,691.69 seq/s, B=64/T=50/"
                                "HID=1024, full step; frac_of_envelope "
                                "1.20 vs the HBM roofline floor, "
                                "TRAIN_FLOORS.json)")
    else:
        row["vs_baseline"] = None
        row["baseline_note"] = (f"B={B} differs from the anchored "
                                "config (B=64); no cross-config ratio")
    return row


def bench_mtvae_train():
    """MTVAE train-step throughput at the reference production scale
    (batch 256, seq 60, n_cond 10, dims 1024/512 — config/
    mt_vae.yaml:13,24,28)."""
    import jax
    import jax.numpy as jnp
    from behavior_driven_video_synthesis_tpu.train.bench_harness import (
        build_mtvae_bench_step,
    )

    from behavior_driven_video_synthesis_tpu.core.timing import (
        time_step_loop,
    )

    B = int(os.environ.get("BENCH_BATCH", "256"))
    state, step, batch, _tx = build_mtvae_bench_step(B=B)
    key = jax.random.PRNGKey(0)
    n_iters = int(os.environ.get("BENCH_ITERS", "10"))
    dt, _, _c = time_step_loop(step, state, batch, key, n_iters,
                               fetch=lambda st: jnp.sum(st.step))
    sps = B * n_iters / dt
    row = {
        "metric": "mtvae_train_throughput",
        "value": round(sps, 2),
        "unit": "sequences/sec/chip",
        **_floor_mfu(_train_floor("mtvae_train"), dt, n_iters,
                     fallback_flops=_loop_flops(_c, n_iters), batch=B),
    }
    if B == 256:
        row["vs_baseline"] = round(sps / 13525.9, 4)
        row["baseline_note"] = ("ratio to the round-5 first chip "
                                "recording (13,525.9 seq/s, B=256/T=60/"
                                "dim=1024, pre-LSTM-layout-optimization; "
                                "the scan-copy rework measured 15,695-"
                                "15,796 = 1.16-1.17x, TRAIN_FLOORS.json)")
    else:
        row["vs_baseline"] = None
        row["baseline_note"] = (f"B={B} differs from the anchored "
                                "config (B=256); no cross-config ratio")
    return row


def bench_orgvunet_train():
    """org-VUNet train-step throughput at the reference production scale
    (DeepFashion 256px, inplane 30-channel part-stack appearance, batch
    8 — config/vunet.yaml:24-43; the 4-group space-to-depth AR prior is
    the org variant's distinctive compute)."""
    import jax
    import jax.numpy as jnp
    from behavior_driven_video_synthesis_tpu.core.timing import (
        time_step_loop,
    )
    from behavior_driven_video_synthesis_tpu.train.bench_harness import (
        build_org_vunet_bench_step,
    )

    B = int(os.environ.get("BENCH_BATCH", "8"))
    S = int(os.environ.get("BENCH_SPATIAL", "256"))
    state, step, batch = build_org_vunet_bench_step(B=B, S=S)
    key = jax.random.PRNGKey(0)
    n_iters = int(os.environ.get("BENCH_ITERS", "10"))
    dt, _, compiled = time_step_loop(
        step, state, batch, key, n_iters,
        fetch=lambda st: jnp.sum(st.step))
    ips = B * n_iters / dt
    row = {
        "metric": f"org_vunet_{S}px_train_throughput",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        # cost_analysis is accurate here (no scan/chunk inner loops in
        # this step); no isolated-op floor has been audited for the org
        # topology — mfu only, stated explicitly
        **_mfu_fields(_loop_flops(compiled, n_iters), dt),
        "flops_note": "cost_analysis FLOPs (valid: no inner loops); no "
                      "audited op floor for the org topology yet",
    }
    if B == 8 and S == 256:
        row["vs_baseline"] = round(ips / 205.31, 4)
        row["baseline_note"] = ("ratio to the round-5 first chip "
                                "recording (205.31 img/s, B=8/256px "
                                "inplane; the reference's 300k-iter "
                                "schedule completes in ~3.3 h/chip)")
    else:
        row["vs_baseline"] = None
        row["baseline_note"] = ("non-default config; no cross-config "
                                "ratio")
    return row


def bench_behavior():
    """Behavior-latent production rate: flow sample -> 50-step rollout."""
    import jax
    import jax.numpy as jnp
    from behavior_driven_video_synthesis_tpu.models import (
        ResidualBehaviorNet,
    )
    from behavior_driven_video_synthesis_tpu.models.flows import LatentFlow

    B = int(os.environ.get("BENCH_BATCH", "256"))
    T, HID, K = 50, 1024, 48
    model = ResidualBehaviorNet(n_kps=K, dim_hidden_b=HID,
                                dtype=jnp.bfloat16)
    flow = LatentFlow(flow_in_channels=HID, flow_mid_channels=2 * HID,
                      n_flows=15)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((B, T, K))
    bp = model.init({"params": key, "sample": key}, x, x, T)["params"]
    fv = flow.init({"params": key}, jnp.zeros((B, HID)))
    n_iters = int(os.environ.get("BENCH_ITERS", "10"))

    def loop(bp, fv, x0, k0):
        def body(i, carry):
            acc, k = carry
            z = jax.random.normal(k, (B, HID))
            b = flow.apply(fv, z, method=flow.reverse)
            xs, _ = model.apply({"params": bp}, b, x0[:, None], T,
                                method=model.generate_seq)
            return acc + jnp.sum(xs.astype(jnp.float32)), \
                jax.random.fold_in(k, i)
        acc, _ = jax.lax.fori_loop(0, n_iters, body,
                                   (jnp.zeros(()), k0))
        return acc

    x0 = jnp.zeros((B, K))
    compiled = jax.jit(loop).lower(bp, fv, x0, key).compile()
    float(compiled(bp, fv, x0, key))
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        float(compiled(bp, fv, x0, jax.random.fold_in(key, r)))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    lps = B * n_iters / dt
    return {
        "metric": "behavior_flow_sample_rollout_rate",
        "value": round(lps, 2),
        "unit": "sequences/sec/chip",
        # ratio to last known good: ~39k seq/s measured on the v5e chip in
        # round 1 at these exact shapes (ROADMAP.md round-1 outcome list);
        # the old anchor (x T / serving north-star) was a unit mismatch
        "vs_baseline": round(lps / 39000.0, 4),
        "baseline_note": "ratio to round-1 chip measurement 39,000 seq/s "
                         "at B=256/T=50/HID=1024 (ROADMAP.md)",
        **_mfu_fields(_loop_flops(compiled, n_iters), dt),
    }


def bench_flow_train():
    """Production flow-stage training step (630M-param flow, B=64, adam)
    with donated state — reported as sequences/sec (reference flow stage,
    experiments/behavior_net.py:704-714)."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import optax
    from behavior_driven_video_synthesis_tpu.models.flows import (
        LatentFlow, flow_loss,
    )

    B = int(os.environ.get("BENCH_BATCH", "64"))
    HID = 1024
    flow = LatentFlow(flow_in_channels=HID, flow_mid_channels=2 * HID,
                      n_flows=15)
    key = jax.random.PRNGKey(0)
    b = jax.random.normal(key, (B, HID))
    fv = flow.init({"params": key}, b)
    tx = optax.adam(1e-4)
    opt = tx.init(fv["params"])
    buffers = fv["buffers"]
    n_iters = int(os.environ.get("BENCH_ITERS", "10"))

    # the whole n_iters training run is ONE dispatch (fori_loop) so relay
    # round trips never pollute the timing; state donation still reuses
    # the param/moment buffers across loop steps inside the executable
    @partial(jax.jit, donate_argnums=(0, 1))
    def loop(params, opt, b, k0):
        def body(i, carry):
            params, opt, _ = carry

            def loss_fn(p):
                z, logdet = flow.apply({"params": p, "buffers": buffers},
                                       b + 1e-4 * i)
                return flow_loss(z, logdet)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        return jax.lax.fori_loop(0, n_iters, body,
                                 (params, opt, jnp.zeros(())))

    compiled = loop.lower(fv["params"], opt, b, key).compile()
    params, opt2, loss = compiled(fv["params"], opt, b, key)
    float(loss)  # force compile + first run
    t0 = time.perf_counter()
    params, opt2, loss = compiled(params, opt2, b, key)
    float(loss)
    dt = time.perf_counter() - t0
    sps = B * n_iters / dt
    row = {
        "metric": "flow_train_rate_630M",
        "value": round(sps, 2),
        "unit": "sequences/sec/chip",
        **_floor_mfu(_train_floor("flow_train"), dt, n_iters,
                     fallback_flops=_loop_flops(compiled, n_iters),
                     batch=B),
    }
    if B == 64:
        # ratio to last known good: 1,904.08 seq/s recorded in BENCH_r03
        # at these exact shapes (B=64, 630M params, donated state).  The
        # old anchor divided steps/sec by the 2,000 f/s SERVING
        # north-star — a unit mismatch that made the column meaningless
        # (VERDICT r3 weak #4).
        row["vs_baseline"] = round(sps / 1904.08, 4)
        row["baseline_note"] = ("ratio to BENCH_r03 recorded 1,904.08 "
                                "seq/s (same shapes, donated state)")
    else:
        row["vs_baseline"] = None
        row["baseline_note"] = (f"B={B} differs from the anchored "
                                "config (B=64); no cross-config ratio")
    return row


def bench_vunet():
    import jax
    import jax.numpy as jnp
    from behavior_driven_video_synthesis_tpu.models.vunet import VUNet

    # measured curve (honest feedback-loop timing): B=32 -> 721 f/s,
    # B=128 -> 1,927 (the knee); B=256 OOMs
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    spatial = int(os.environ.get("BENCH_SPATIAL", "256"))

    model = VUNet(
        spatial_size=spatial, n_channels_x=3, nf_start=32, nf_max=128,
        bottleneck_factor=2, box_factor=2, variant="alter",
        dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 2),
                          (batch, spatial, spatial, 3), jnp.float32)
    c = jax.random.normal(jax.random.fold_in(key, 3),
                          (batch, spatial, spatial, 3), jnp.float32)
    variables = model.init(
        {"params": key, "sample": jax.random.fold_in(key, 1)}, x, c
    )

    n_iters = int(os.environ.get("BENCH_ITERS", "25"))

    # Methodology notes (this environment's TPU is behind a network relay):
    #  * block_until_ready() returns BEFORE device execution completes, so
    #    completion must be forced by fetching the (scalar) result;
    #  * per-call dispatch costs 100-600 ms of relay jitter, so the timed
    #    region is ONE dispatch of an in-jit fori_loop over n_iters;
    #  * the residual single roundtrip is filtered by taking the min of a
    #    few repeats.
    def loop(variables, x, c, key):
        def body(i, carry):
            acc, x, c, k = carry
            out = model.apply(variables, x, c, rngs={"sample": k},
                              method=model.transfer)
            d = jnp.mean(out.astype(jnp.float32)) * 1e-6
            # output feeds the next inputs: the body cannot be hoisted
            return (acc + d, x + d, c + d, jax.random.fold_in(k, i))
        acc, _, _, _ = jax.lax.fori_loop(0, n_iters, body,
                                         (jnp.zeros(()), x, c, key))
        return acc

    compiled = jax.jit(loop).lower(variables, x, c, key).compile()
    float(compiled(variables, x, c, key))  # warm
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        float(compiled(variables, x, c, jax.random.fold_in(key, r)))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    fps = batch * n_iters / dt
    return {
        "metric": f"vunet_{spatial}px_transfer_throughput",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / NORTH_STAR_FPS, 4),
        **_mfu_fields(_loop_flops(compiled, n_iters), dt,
                      envelope_tflops=CONV_ENVELOPE_TFLOPS,
                      envelope_note=CONV_ENVELOPE_NOTE),
    }


# partial results stash so the watchdog can still emit an honest line if a
# later sub-bench wedges on the relay
_ROUND_PARTIAL = {}


def main():
    mode = os.environ.get("BENCH_MODE", "round")
    single = {
        "pipeline": bench_pipeline,
        "train": bench_cvbae_train,
        "behavior": bench_behavior,
        "behaviortrain": bench_behavior_train,
        "mtvaetrain": bench_mtvae_train,
        "orgtrain": bench_orgvunet_train,
        "flowtrain": bench_flow_train,
        "vunet": bench_vunet,
    }
    if mode in single:
        print(json.dumps(single[mode]()))
        return
    # round mode: serving headline + the two production training workloads,
    # one JSON line (VERDICT r2 item 2: multi-metric with MFU accounting).
    # The headline runs the DOCUMENTED TPU serving preset (bdvs-generate
    # --preset tpu-serving = int8_static + quant_max_hw 128) — VERDICT r2
    # item 7 set the bar as "BENCH >=1.25x north-star" for exactly this
    # preset; its numerics on a trained ckpt are rel-L2 0.003 / SSIM 0.9995
    # vs f32 (QUANT_ABLATION.json).  The bf16 pipeline is kept as an extra
    # row for continuity with BENCH_r01/r02.
    head = bench_pipeline(quant="int8_static", quant_max_hw=128)
    head["metric"] += "_int8_serving_preset"
    head["preset"] = ("bdvs-generate --preset tpu-serving (int8_static + "
                      "quant_max_hw 128); trained-ckpt numerics rel-L2 "
                      "0.003 / SSIM 0.9995 vs f32, QUANT_ABLATION.json")
    _ROUND_PARTIAL.update(head)
    print(f"# pipeline(int8 preset) done: {head['value']} f/s",
          file=sys.stderr, flush=True)
    # the full training-family matrix (VERDICT r4 item 4): every row is
    # recorded; if the relay wedges mid-run the watchdog emits whatever
    # finished plus an explicit note of what was dropped
    extras = []
    for fn in (bench_pipeline, bench_cvbae_train, bench_flow_train,
               bench_behavior_train, bench_mtvae_train,
               bench_orgvunet_train, bench_behavior, bench_vunet):
        row = fn()
        extras.append(row)
        _ROUND_PARTIAL["extra_metrics"] = extras
        print(f"# {row['metric']} done: {row['value']}", file=sys.stderr,
              flush=True)
    head["extra_metrics"] = extras
    print(json.dumps(head))


def _wait_for_healthy_relay(budget_s: int) -> bool:
    """The TPU relay wedges transiently (ROADMAP.md: even jnp.sum hangs;
    self-recovers after ~15-30 min idle).  Probe it with a tiny op in a
    SUBPROCESS (a wedged in-process fetch blocks in C and can dodge
    SIGALRM), and wait-and-retry until it answers or the budget is spent.
    Returns True if the relay answered."""
    import subprocess

    probe = (
        "import jax, jax.numpy as jnp;"
        "print(float(jax.jit(lambda x: jnp.sum(x * 2))"
        "(jnp.ones((256, 256)))))"
    )
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], timeout=240,
                capture_output=True, text=True,
                env={**os.environ, "JAX_PLATFORMS": ""},
            )
            if r.returncode == 0:
                if attempt > 1:
                    print(f"# relay healthy after {attempt} probes",
                          file=sys.stderr, flush=True)
                return True
            err = (r.stderr or "").strip().splitlines()
            print(f"# relay probe {attempt} rc={r.returncode} "
                  f"{err[-1] if err else ''}", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"# relay probe {attempt} timed out (240s) — wedged",
                  file=sys.stderr, flush=True)
        if time.time() + 300 > deadline:
            return False
        time.sleep(300)  # idle time is what un-wedges the relay


def _watchdog(seconds: int):
    """The TPU relay in this environment can wedge (even trivial ops hang).
    Abort with a diagnostic instead of stalling the driver forever; never
    print a fabricated metric.  If the headline metric already finished,
    emit it (with whatever extras completed) instead of dropping it."""
    import signal

    def handler(signum, frame):
        if _ROUND_PARTIAL.get("value") is not None:
            out = dict(_ROUND_PARTIAL)
            out["error"] = (f"partial: relay wedged after {seconds}s; "
                            "remaining extra_metrics omitted")
            print(json.dumps(out), flush=True)
            os._exit(0)
        print(json.dumps({
            "metric": "bench_error",
            "value": None,
            "unit": "n/a",
            "vs_baseline": None,
            "error": f"TPU relay unresponsive for {seconds}s "
                     "(see ROADMAP.md environment notes); "
                     "last known-good: pipeline 2361 frames/sec/chip "
                     "(B=20, honest feedback-loop timing)",
        }), flush=True)
        os._exit(3)

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


if __name__ == "__main__":
    # wait out a transiently wedged relay BEFORE arming the bench watchdog
    # (probing costs nothing when healthy: one tiny-op subprocess)
    # default raised to 2400 (round 5): observed wedges after heavy bench
    # days run 30-60 min; the successful r4 round bench needed 2400
    probe_budget = int(os.environ.get("BENCH_PROBE_BUDGET_S", "2400"))
    if probe_budget > 0 and not _wait_for_healthy_relay(probe_budget):
        print(json.dumps({
            "metric": "bench_error",
            "value": None,
            "unit": "n/a",
            "vs_baseline": None,
            "error": f"TPU relay unresponsive to tiny-op probes for "
                     f"{probe_budget}s (see ROADMAP.md environment notes); "
                     "last known-good: pipeline 2361 frames/sec/chip "
                     "(B=20, honest feedback-loop timing)",
        }), flush=True)
        sys.exit(3)
    _watchdog(int(os.environ.get("BENCH_WATCHDOG_S", "2700")))
    main()
