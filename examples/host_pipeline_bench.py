"""Host input-pipeline throughput at production shapes (SURVEY §2.4).

Measures what the HOST must do per training sample (the reference feeds a
20-worker torch DataLoader; our loader is prefetch_iter + these kernels)
and publishes imgs/sec so "can the host feed the chip" is a measured claim
rather than an open one:

  stage 1  jpeg decode      cv2.imread of a ~1000x1000 production frame
  stage 2  crop+resize      bbox crop -> 256x256 (pose/app image prep)
  stage 3  part stack       normalize_parts: 10 perspective warps -> 64px
                            channel stack (the inplane 30ch appearance)
  stage 4  stickman raster  256px skeleton render (native C++ vs host cv2;
                            the SERVING path rasters on-device instead —
                            pipeline.py — so serving needs no host raster)
  e2e      full sample      decode + crop + stickman + part stack, the
                            per-sample work of inplane cvbae training

Each stage runs single-threaded and under a thread pool (the native
kernels and cv2 release the GIL).  NOTE: this box has ONE vCPU, so pooled
numbers here measure overhead, not scaling; the artifact records
cpu_count so per-core rates can be extrapolated to a production host.

Consumption targets (ROADMAP/BENCH): cvbae train 110-157 img/s/chip at
B=12-48; serving 2367 f/s/chip but host-side only ONE appearance image +
one part stack per GENERATED VIDEO (raster + synthesis run on device).

Run: python examples/host_pipeline_bench.py [--n 64] [--size 256]
Writes HOST_PIPELINE.json at the repo root.
"""
import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import cv2

from behavior_driven_video_synthesis_tpu.data import native
from behavior_driven_video_synthesis_tpu.data.human36m import (
    detailed_joint_model,
)
from behavior_driven_video_synthesis_tpu.data.parts import (
    default_norm_T,
    normalize_parts,
)
from behavior_driven_video_synthesis_tpu.geometry.stickman import (
    get_line_colors,
    make_joint_img,
)
from behavior_driven_video_synthesis_tpu.utils.boxes import crop_with_bbox


def synth_frame(rng, h=1000, w=1000):
    """A production-like camera frame: textured background + a figure."""
    img = (rng.rand(h // 8, w // 8, 3) * 255).astype(np.uint8)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    cv2.circle(img, (w // 2, h // 3), h // 10,
               tuple(int(c) for c in rng.randint(0, 255, 3)), -1)
    cv2.rectangle(img, (w // 3, h // 3), (2 * w // 3, 9 * h // 10),
                  tuple(int(c) for c in rng.randint(0, 255, 3)), -1)
    return img


def synth_kps32(rng, h=1000, w=1000):
    """32-joint full-layout keypoints inside the frame (pixel coords)."""
    base = np.array([w // 2, h // 2], np.float32)
    return (base + rng.randn(32, 2).astype(np.float32) * h / 6).clip(
        50, h - 50)


def rate(fn, items, pool=None):
    """items/sec for fn over items; min over 3 repeats."""
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        if pool is None:
            for it in items:
                fn(it)
        else:
            list(pool.map(fn, items))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return len(items) / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()
    S = args.size
    rng = np.random.RandomState(0)
    jm = detailed_joint_model(world_coords=False)
    if not getattr(jm, "norm_T", None):
        jm.norm_T = default_norm_T(jm)
    n_parts = len(jm.norm_T)
    part_size = S // 4  # box_factor=2 production default

    # fixtures: n JPEGs on disk + keypoints
    import tempfile
    tmp = tempfile.mkdtemp(prefix="bdvs_hostbench_")
    paths, kps_all = [], []
    for i in range(args.n):
        p = os.path.join(tmp, f"f{i:04d}.jpg")
        cv2.imwrite(p, synth_frame(rng), [cv2.IMWRITE_JPEG_QUALITY, 90])
        paths.append(p)
        kps_all.append(synth_kps32(rng))
    frames = [cv2.imread(p) for p in paths]
    kps_small = [k * (S / 1000.0) for k in kps_all]
    line_colors = get_line_colors((len(jm.right_lines), len(jm.left_lines),
                                   len(jm.head_lines) + 1))

    results = {"n": args.n, "size": S, "part_size": part_size,
               "n_parts": n_parts, "cpu_count": os.cpu_count(),
               "native_available": native.available(),
               "stages": {}}

    def bench_stage(name, fn, items):
        st = {"single_thread_ips": round(rate(fn, items), 1)}
        with ThreadPoolExecutor(args.threads) as pool:
            st[f"pool{args.threads}_ips"] = round(
                rate(fn, items, pool=pool), 1)
        results["stages"][name] = st
        print(f"{name}: {st}", flush=True)

    bench_stage("jpeg_decode_1000px", lambda p: cv2.imread(p), paths)
    if native.decode_available():
        def read_bytes(p):
            with open(p, "rb") as f:
                return f.read()
        streams = [read_bytes(p) for p in paths]
        bench_stage("jpeg_decode_native_full",
                    lambda s: native.decode_jpeg(s, 1), streams)
        # the loader's DCT-downscaled path (data/base.py _load_image_rgb):
        # largest denom keeping both dims >= S, so the later resize to S
        # is still a pure downscale
        h0, w0 = native.jpeg_dims(streams[0])
        denom = native.pick_scale_denom(h0, w0, S)
        bench_stage(f"jpeg_decode_native_dct1_{denom}",
                    lambda s: native.decode_jpeg(s, denom), streams)
        results["dct_denom"] = denom
    bench_stage(
        "crop_resize", lambda t: cv2.resize(
            crop_with_bbox(t[0], t[1]), (S, S),
            interpolation=cv2.INTER_LINEAR),
        list(zip(frames, kps_all)))

    small = [cv2.resize(crop_with_bbox(f, k), (S, S),
                        interpolation=cv2.INTER_LINEAR)
             for f, k in zip(frames, kps_all)]
    bench_stage(
        f"part_stack_{n_parts}x{part_size}px",
        lambda t: normalize_parts(t[0], t[1], jm, part_size),
        list(zip(small, kps_small)))

    bench_stage(
        f"stickman_cv2_{S}px",
        lambda k: make_joint_img((S, S, 3), k, jm,
                                 line_colors=line_colors, scale_factor=S),
        kps_small)
    if native.available():
        bench_stage(
            f"stickman_native_{S}px",
            lambda k: native.render_stickman_batch(k[None], jm, S,
                                                   n_threads=1),
            kps_small)
        # the batched form the loader actually calls (one call per batch)
        kb = np.stack(kps_small)
        t0 = time.perf_counter()
        for _ in range(3):
            native.render_stickman_batch(kb, jm, S, n_threads=args.threads)
        bat = 3 * len(kb) / (time.perf_counter() - t0)
        results["stages"][f"stickman_native_batched_{S}px"] = {
            f"batch{len(kb)}_t{args.threads}_ips": round(bat, 1)}
        print(f"stickman_native_batched: {bat:.1f} img/s", flush=True)

    def full_sample(t):
        path, kps, kps_s = t
        img = cv2.imread(path)
        img = cv2.resize(crop_with_bbox(img, kps), (S, S),
                         interpolation=cv2.INTER_LINEAR)
        stick = (native.render_stickman_batch(kps_s[None], jm, S)[0]
                 if native.available() else
                 make_joint_img((S, S, 3), kps_s, jm,
                                line_colors=line_colors, scale_factor=S))
        parts = normalize_parts(img, kps_s, jm, part_size)
        return img, stick, parts

    bench_stage("full_sample_e2e",
                full_sample, list(zip(paths, kps_all, kps_small)))

    if native.decode_available():
        # the production loader path (data/base.py _load_image_rgb +
        # _prep_image): native decode at the DCT denom chosen above,
        # resize to S, then crop/stickman/parts exactly as full_sample
        def full_sample_native(t):
            stream, kps, kps_s = t
            img = native.decode_jpeg(stream, denom)
            img = cv2.resize(img, (S, S), interpolation=cv2.INTER_LINEAR)
            img = cv2.resize(crop_with_bbox(img, kps_s), (S, S),
                             interpolation=cv2.INTER_LINEAR)
            stick = native.render_stickman_batch(kps_s[None], jm, S)[0]
            parts = normalize_parts(img, kps_s, jm, part_size)
            return img, stick, parts

        bench_stage("full_sample_e2e_native", full_sample_native,
                    list(zip(streams, kps_all, kps_small)))

        # numerics: the DCT-downscaled decode+resize vs full decode+resize
        # on the same frame (both end at SxS)
        a = cv2.resize(native.decode_jpeg(streams[0], denom), (S, S),
                       interpolation=cv2.INTER_LINEAR).astype(np.float32)
        b = cv2.resize(native.decode_jpeg(streams[0], 1), (S, S),
                       interpolation=cv2.INTER_LINEAR).astype(np.float32)
        err = np.abs(a - b)
        results["dct_downscale_numerics"] = {
            "mean_abs_err_u8": round(float(err.mean()), 3),
            "p99_abs_err_u8": round(float(np.percentile(err, 99)), 1),
            "note": ("DCT-downscaled decode then resize-to-S vs full "
                     "decode then resize-to-S; both pure downscales of "
                     "the same stream"),
        }

    e2e = results["stages"]["full_sample_e2e"]["single_thread_ips"]
    e2e_prod = results["stages"].get(
        "full_sample_e2e_native", {}).get("single_thread_ips", e2e)
    results["verdict"] = {
        "train_target_ips": 157.0,
        "cores_needed_for_train_target": round(
            157.0 / max(e2e_prod, 1e-9), 2),
        "cores_needed_cv2_path": round(157.0 / max(e2e, 1e-9), 2),
        "note": ("serving needs only 1 appearance prep per video: raster "
                 "+ synthesis run on device (pipeline.py); the production "
                 "loader uses the native DCT-downscaled decode "
                 "(full_sample_e2e_native)"),
    }
    path = os.path.join(os.path.dirname(__file__), "..",
                        "HOST_PIPELINE.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", os.path.abspath(path))
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
