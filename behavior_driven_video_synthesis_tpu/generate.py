"""Serving CLI (`bdvs-generate`): generate behavior-transfer RGB videos
from TRAINED checkpoints in a fresh process — the deployment entry point.

The reference has no serving CLI; its equivalent capability is buried in
inference-time visualization (reference lib/logging.py:103-906 renders
videos inside `run_inference`).  Here the compiled
`BehaviorTransferPipeline` (flow inverse -> decoder rollout -> FK/camera ->
on-device stickman raster -> VUNet synthesis, ONE jit) is driven directly
from two run directories:

    bdvs-generate --behavior_model <base>/behavior_net \
                  --synth_model <base>/cvbae_run \
                  [--mode sample|transfer] [--request req.npz] \
                  [--quant int8_static] [--upsample transpose] \
                  [--out ./served] [--length 50] [--batch 4]

Modes
  sample    z ~ N(0,1) -> flow inverse (when the behavior run has a
            flow_ckpt) -> rollout -> render: novel behaviors.
  transfer  infer the behavior posterior mean from the request's `source`
            sequences and re-enact it from `x_start`.

Request file (.npz), all optional with synthetic fallbacks:
  x_start     (B, K)  normalized start poses
  source      (B, T, K) normalized source sequences (transfer mode)
  app_img     (B, S, S, 3) appearance in [-1, 1] float (or uint8 0..255);
              inplane-trained synthesis runs instead take the 30ch part
              stack at (B, S/2^box_factor, S/2^box_factor, 30)
  extrinsics  (B, 3, 4); intrinsics (B, 4) as (fx, x0, fy, y0)
  image_size  (B, 2)
  norm_mean / norm_std (K_full,) and dim_to_use (K,) unnormalization stats
            (default: identity stats over K dims)

Serving options map 1:1 onto the framework's TPU serving features:
`--quant int8_static` runs the per-frame convs as PTQ int8 on the MXU
(one calibration pass on the request itself), `--upsample transpose`
lowers subpixel upsamples as param-identical transposed convs.  Both work
on any trained checkpoint — no conversion step.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _load_run(run_dir: str, role: str):
    """Raw-pytree checkpoint + config resolution, shared with the
    cross-model rendering path (experiments.visualize)."""
    from .experiments.visualize import load_run_checkpoint

    return load_run_checkpoint(run_dir, role)


def chain_joint_model(n_joints: int):
    """Minimal consecutive-chain skeleton for non-H36M keypoint layouts
    (synthetic runs): renders every joint, no anatomical semantics."""
    from .geometry.stickman import JointModel

    edges = [(i, i + 1) for i in range(max(n_joints - 1, 1))]
    half = max(len(edges) // 2, 1)
    return JointModel(
        body=list(range(min(3, n_joints))),
        right_lines=edges[:half],
        left_lines=edges[half:] or edges[:1],
        head_lines=edges[:1],
        face=[],
        rshoulder=0,
        lshoulder=min(1, n_joints - 1),
        headup=min(2, n_joints - 1),
        kps_to_use=list(range(n_joints)),
        total_relative_joints=[],
        kp_to_joint=["joint"] * n_joints,
    )


def _default_camera(b: int, spatial: int):
    extr = np.tile(np.hstack([np.eye(3), [[0.0], [0.0], [4.0]]]
                             ).astype(np.float32), (b, 1, 1))
    f = float(spatial) * 4.5
    intr = np.tile(np.asarray([f, spatial / 2.0, f, spatial / 2.0],
                              np.float32), (b, 1))
    imsize = np.full((b, 2), float(spatial), np.float32)
    return extr, intr, imsize


def parse_args(argv=None):
    ap = argparse.ArgumentParser(
        description="Generate behavior-transfer videos from trained "
                    "checkpoints (serving entry point)")
    ap.add_argument("--behavior_model", required=True,
                    help="behavior_net run dir (reg_ckpt [+ flow_ckpt])")
    ap.add_argument("--synth_model", required=True,
                    help="cvbae/vunet run dir (VUNet reg_ckpt)")
    ap.add_argument("--request", default=None,
                    help=".npz request file (see module docstring)")
    ap.add_argument("--from_dataset", action="store_true",
                    help="build the request from the behavior run's own "
                         "configured dataset (test split): real source "
                         "sequences, norm stats, appearance and cameras")
    ap.add_argument("--mode", choices=["sample", "transfer"],
                    default="sample")
    ap.add_argument("--out", default="./served")
    ap.add_argument("--batch", type=int, default=4,
                    help="videos per request when no request file given")
    ap.add_argument("--length", type=int, default=50)
    ap.add_argument("--fps", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    # sentinel defaults (None) so preset expansion can tell "user set this
    # explicitly" from "default" even under argparse prefix abbreviation
    # (e.g. `--qua none` must win over --preset tpu-serving)
    ap.add_argument("--quant", choices=["none", "int8_static"],
                    default=None)
    ap.add_argument("--quant_max_hw", type=int, default=None,
                    help="leave convs with input height above this in bf16")
    ap.add_argument("--upsample", choices=["subpixel", "transpose"],
                    default="subpixel")
    ap.add_argument("--preset", choices=["none", "tpu-serving"],
                    default="none",
                    help="tpu-serving = --quant int8_static "
                         "--quant_max_hw 128: the documented TPU serving "
                         "preset — 2,526 f/s/chip e2e at 256px, rel-L2 "
                         "0.003 / SSIM 0.9995 vs f32 on a trained ckpt "
                         "(SERVING_GAP.json, QUANT_ABLATION.json); "
                         "explicit --quant/--quant_max_hw flags win")
    args = ap.parse_args(argv)
    if args.preset == "tpu-serving":
        if args.quant is None:
            args.quant = "int8_static"
        if args.quant_max_hw is None:
            args.quant_max_hw = 128
    # resolve remaining sentinels to the plain defaults
    if args.quant is None:
        args.quant = "none"
    if args.quant_max_hw is None:
        args.quant_max_hw = 0
    return args


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .data.human36m import detailed_joint_model
    from .experiments.visualize import render_rgb_videos
    from .models import ResidualBehaviorNet
    from .models.flows import LatentFlow
    from .models.vunet import vunet_from_config
    from .pipeline import BehaviorTransferPipeline

    braw, bcfg = _load_run(args.behavior_model, "reg_ckpt")
    net_params = braw["net"]["params"]
    flow_vars = None
    try:
        fraw, _ = _load_run(args.behavior_model, "flow_ckpt")
        flow_vars = {"params": fraw["flow"]["params"],
                     "buffers": fraw["flow"]["buffers"]}
    except FileNotFoundError:
        print("no flow checkpoint: 'sample' draws behavior latents from "
              "N(0,1) directly")
    barch = bcfg.architecture if bcfg else {}
    hid = int(barch.get("dim_hidden_b", 1024))

    sraw, scfg = _load_run(args.synth_model, "reg_ckpt")
    vunet_params = sraw["vunet"]["params"]
    sarch = scfg.architecture if scfg else {}
    sdata = scfg.data if scfg else {}
    spatial = int(sdata.get("spatial_size", 64))
    s_inplane = bool(sdata.get("inplane_normalize", False))
    s_exp = str(scfg.general.get("experiment", "cvbae")) if scfg else "cvbae"
    s_boxf = int(sdata.get("box_factor", 2))
    # inplane runs consume the 30ch part stack at spatial/2^box_factor
    app_hw = spatial // (2 ** s_boxf) if s_inplane else spatial
    app_ch = 30 if s_inplane else 3

    # the trained keypoint width comes from the checkpoint itself
    n_kps_ckpt = int(np.asarray(
        braw["net"]["params"]["decoder"]["b_out"]).shape[-1])

    # ---- request ----------------------------------------------------------
    req = dict(np.load(args.request)) if args.request else {}
    rng = np.random.RandomState(args.seed)
    jm_override = None
    if args.from_dataset:
        if bcfg is None:
            raise SystemExit("--from_dataset needs the behavior run's "
                             "config.yaml next to its checkpoints")
        from .experiments.data_factory import build_sequence_data

        loader, meta = build_sequence_data(bcfg, mode="test")
        batch = next(iter(loader))
        kps = np.asarray(batch["keypoints"], np.float32)[:args.batch]
        req.setdefault("source", kps[:, :-1])
        req.setdefault("x_start", kps[:, 0])
        stats = meta.get("norm_stats")
        if stats is not None:
            req.setdefault("norm_mean", np.asarray(stats.mean))
            req.setdefault("norm_std", np.asarray(stats.std))
            req.setdefault("dim_to_use", np.asarray(stats.dim_to_use))
        ds = meta.get("dataset")
        jm_override = getattr(ds, "joint_model", None)
        if "app_img" not in req and ds is not None and hasattr(
                ds, "datadict") and "img_paths" in getattr(
                    ds, "datadict", {}):
            from .experiments.visualize import get_synth_input

            apps, extrs, intrs, sizes = [], [], [], []
            for i in range(len(kps)):
                if s_inplane:
                    # the synth run consumes the 30ch part stack
                    # (reference _get_app_img(tid, inplane_norm=True)).
                    # Image AND rendering keypoints must come from the
                    # SAME dict/index — use the dataset's own (reduced)
                    # datadict for both (get_synth_input reads the larger
                    # complete dict, whose index i is a different frame).
                    if not getattr(ds.joint_model, "norm_T", None):
                        raise SystemExit(
                            "inplane synth run but the behavior dataset's "
                            "joint model defines no part homographies "
                            "(norm_T); supply app_img via --request")
                    from .data.parts import normalize_parts

                    img = ds._prep_image(i)  # RGB at ds.spatial_size
                    kr = ds._get_kps_for_rendering(i)  # same-index pixels
                    a = normalize_parts(
                        img, kr, ds.joint_model,
                        spatial // (2 ** s_boxf)
                    ).astype(np.float32) / 127.5 - 1.0
                    dd_i = ds.datadict
                    e = np.asarray(dd_i["extrinsics_univ"][i], np.float32)
                    ii = np.asarray(dd_i["intrinsics_univ"][i], np.float32)
                    sz = np.asarray(dd_i["image_size"][i], np.float32)
                else:
                    a, e, ii, sz = get_synth_input(ds, i, spatial)
                apps.append(a)
                extrs.append(e)
                intrs.append(ii)
                sizes.append(sz)
            req["app_img"] = np.stack(apps)
            req["extrinsics"] = np.stack(extrs)
            req["intrinsics"] = np.stack(intrs)
            req["image_size"] = np.stack(sizes)
        print(f"request built from the run's dataset: "
              f"{len(kps)} sequences"
              + (", real appearance/cameras" if "app_img" in req
                 else ", synthetic appearance/camera fallback"))
    if "x_start" in req:
        x_start = np.asarray(req["x_start"], np.float32)
    else:
        # neutral near-origin start in normalized coords
        x_start = rng.randn(args.batch, n_kps_ckpt).astype(
            np.float32) * 0.05
    B, K = x_start.shape
    if K != n_kps_ckpt:
        raise SystemExit(f"request x_start has {K} dims but the behavior "
                         f"checkpoint was trained with {n_kps_ckpt}")
    source = np.asarray(req["source"], np.float32) if "source" in req \
        else None
    if args.mode == "transfer" and source is None:
        raise SystemExit("--mode transfer needs `source` sequences in the "
                         "request file")
    if source is not None:
        if source.ndim != 3 or source.shape[0] != B \
                or source.shape[-1] != K:
            raise SystemExit(
                f"request source must be (B={B}, T, {K}); got "
                f"{source.shape}")
    mean = np.asarray(req.get("norm_mean", np.zeros(K)), np.float32)
    std = np.asarray(req.get("norm_std", np.ones(K)), np.float32)
    dim_to_use = np.asarray(req.get("dim_to_use", np.arange(K)), np.int64)
    if "app_img" in req:
        app = np.asarray(req["app_img"])
        if app.dtype == np.uint8:
            app = app.astype(np.float32) / 127.5 - 1.0
        app = app.astype(np.float32)
        if app.shape[-1] != app_ch:
            raise SystemExit(
                f"this synthesis run expects {app_ch}-channel appearance "
                f"({'inplane part stack' if s_inplane else 'RGB'}), got "
                f"{app.shape[-1]} channels")
        if app.shape[1] != app_hw:
            if app_ch != 3:
                raise SystemExit(
                    f"inplane appearance must be exactly "
                    f"({app_hw},{app_hw},30); got {app.shape[1:]}")
            import cv2

            app = np.stack([cv2.resize(a, (app_hw, app_hw)) for a in app])
    else:
        app = np.full((B, app_hw, app_hw, app_ch), 0.1, np.float32)
    extr_d, intr_d, imsize_d = _default_camera(B, spatial)
    extr = np.asarray(req.get("extrinsics", extr_d), np.float32)
    intr = np.asarray(req.get("intrinsics", intr_d), np.float32)
    imsize = np.asarray(req.get("image_size", imsize_d), np.float32)

    n_joints = int(len(dim_to_use)) // 3
    jm = jm_override or (detailed_joint_model(world_coords=True)
                         if n_joints == 17 else chain_joint_model(n_joints))

    # ---- models (serving config) ------------------------------------------
    behavior = ResidualBehaviorNet(
        n_kps=K,
        dim_hidden_b=hid,
        decoder_arch=str(barch.get("decoder_arch", "lstm")),
        use_nin_dec=bool(barch.get("linear_in_decoder", False)),
        information_bottleneck=True,
    )
    flow_model = None
    if flow_vars is not None:
        flow_model = LatentFlow(
            flow_in_channels=hid,
            flow_mid_channels=hid * int(barch.get(
                "flow_mid_channels_factor", 2)),
            flow_hidden_depth=int(barch.get("flow_hidden_depth", 2)),
            n_flows=int(barch.get("n_flows", 15)),
        )
    # the shared builder reconstructs the EXACT trained param tree from
    # the run's dumped config (same defaults as the training driver);
    # serving-only knobs layer on top as overrides
    vunet = vunet_from_config(
        scfg, "org" if s_exp == "vunet" else "alter",
        dtype=jnp.bfloat16,
        quant=args.quant,
        quant_max_hw=args.quant_max_hw,
        upsample_transpose=args.upsample == "transpose",
    )

    # transfer re-enacts the inferred posterior MEAN directly (no flow);
    # only build the pipeline's flow stage when it will actually run
    use_flow = args.mode == "sample" and flow_vars is not None
    pipe = BehaviorTransferPipeline(
        behavior, vunet, jm, mean, std, dim_to_use, spatial_size=spatial,
        stickman_thickness=max(2.0, spatial / 64.0),
        flow_model=flow_model if use_flow else None)
    params = {"behavior": net_params, "vunet": vunet_params,
              "flow": flow_vars if use_flow else None}

    key = jax.random.PRNGKey(args.seed)
    if args.mode == "transfer":
        _, mu, _, _ = behavior.apply(
            {"params": net_params}, jnp.asarray(source), sample=False,
            rngs={"sample": key}, method=behavior.infer_b)
        z = mu
    else:
        z = jax.random.normal(key, (B, hid))

    if args.quant == "int8_static":
        params["vunet_quant"] = pipe.calibrate(
            params, z, jnp.asarray(x_start), jnp.asarray(app),
            jnp.asarray(extr), jnp.asarray(intr), jnp.asarray(imsize),
            key, length=args.length, use_flow=use_flow)
        print("int8_static: calibrated activation scales on the request")

    os.makedirs(args.out, exist_ok=True)
    paths = render_rgb_videos(
        pipe, params, z, jnp.asarray(x_start), jnp.asarray(app),
        jnp.asarray(extr), jnp.asarray(intr), jnp.asarray(imsize),
        key, args.out, length=args.length, fps=args.fps,
        tag=f"{args.mode}_")
    manifest = {"mode": args.mode, "batch": B, "length": args.length,
                "spatial": spatial, "quant": args.quant,
                "upsample": args.upsample,
                "flow": bool(use_flow and flow_vars is not None),
                "videos": paths}
    mpath = os.path.join(args.out, "manifest.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {len(paths)} videos + {mpath}")
    return manifest


if __name__ == "__main__":
    main()
