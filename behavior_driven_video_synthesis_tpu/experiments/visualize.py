"""Training/eval-time visualization orchestration.

Equivalent of the reference's `visualize_transfer3d` / `make_eval_grid`
(lib/logging.py:103-906, :1548-1867): generate reconstruction, behavior-swap
and prior/flow-sample rollouts, render 3D skeleton videos and (when a synth
model is attached) RGB videos, write mp4s under ``generated/``.

Device work (rollouts, unnormalize, FK-free world poses) is one jit per
video batch; only mp4 encoding is host-side.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.normalization import unnormalize
from ..viz import create_video_3d, frames_to_uint8, make_eval_grid, \
    write_video


def visualize_transfer3d(model, net_params, batch, out_dir: str, key,
                         seq_len: int, norm_stats=None,
                         flow_model=None, flow_variables=None,
                         n_vids: int = 2, n_samples: int = 3,
                         fps: int = 12, tag: str = "") -> Dict[str, str]:
    """Generate the behavior-transfer video suite for a batch.

    Writes per-sequence mp4s:  recon (self rollout), swap (behavior of A on
    start pose of B), and prior/flow samples — each as a 3D skeleton video.
    Returns {name: path}.
    """
    os.makedirs(out_dir, exist_ok=True)
    kps = jnp.asarray(batch["keypoints"], jnp.float32)[:n_vids]
    kps_cross = jnp.asarray(
        batch.get("paired_keypoints", batch["keypoints"]),
        jnp.float32)[:n_vids]
    B = kps.shape[0]

    @jax.jit
    def rollouts(net_params, kps, kps_cross, key):
        seq_s, seq_t = kps[:, :-1], kps_cross[:, :-1]
        k1, k2 = jax.random.split(key)
        x_recon, _, b, mu, logstd, _ = model.apply(
            {"params": net_params}, seq_s, seq_s, seq_len,
            rngs={"sample": k1})
        x_swap, _ = model.apply({"params": net_params}, mu, seq_t, seq_len,
                                method=model.generate_seq)
        z = jax.random.normal(k2, (B * n_samples, mu.shape[-1]))
        if flow_variables is not None:
            b_s = flow_model.apply(flow_variables, z,
                                   method=flow_model.reverse)
        else:
            b_s = z
        starts = jnp.repeat(seq_s, n_samples, axis=0)
        x_samp, _ = model.apply({"params": net_params}, b_s,
                                starts[:, :1], seq_len,
                                method=model.generate_seq)
        return x_recon, x_swap, x_samp.reshape(B, n_samples, seq_len, -1)

    x_recon, x_swap, x_samp = rollouts(net_params, kps, kps_cross, key)

    def to_world(flat):
        arr = np.asarray(flat)
        if norm_stats is not None:
            arr = np.asarray(unnormalize(arr, norm_stats))
        return arr.reshape(arr.shape[:-1] + (-1, 3))

    paths = {}
    gt_w = to_world(np.asarray(kps[:, 1:]))
    recon_w = to_world(x_recon)
    swap_w = to_world(x_swap)
    samp_w = to_world(x_samp)

    for i in range(B):
        name = f"{tag}seq{i}"
        gt_frames = create_video_3d(gt_w[i], fps=fps)
        rec_frames = create_video_3d(recon_w[i], fps=fps)
        swap_frames = create_video_3d(swap_w[i], fps=fps)
        grid = make_eval_grid([gt_frames, rec_frames, swap_frames])
        p = os.path.join(out_dir, f"{name}_transfer.mp4")
        write_video(grid.astype(np.uint8), p, fps=fps)
        paths[f"{name}_transfer"] = p

        sample_rows = [create_video_3d(samp_w[i, s], fps=fps)
                       for s in range(n_samples)]
        p2 = os.path.join(out_dir, f"{name}_samples.mp4")
        write_video(make_eval_grid(sample_rows).astype(np.uint8), p2,
                    fps=fps)
        paths[f"{name}_samples"] = p2
    return paths


def render_rgb_videos(pipeline, params, z, x_start, app_img, extrinsics,
                      intrinsics, image_size, key, out_dir: str,
                      length: int = 50, fps: int = 12,
                      tag: str = "rgb") -> Dict[str, str]:
    """Run the compiled behavior-transfer pipeline and write RGB mp4s
    (the reference's per-frame VUNet rendering hook,
    data_conversions_3d.py:1068-1228)."""
    os.makedirs(out_dir, exist_ok=True)
    out = pipeline.generate(params, z, x_start, app_img, extrinsics,
                            intrinsics, image_size, key, length=length)
    frames = frames_to_uint8(np.asarray(out["frames"]))
    stick = frames_to_uint8(np.asarray(out["stickman"]))
    paths = {}
    for i in range(frames.shape[0]):
        grid = np.concatenate([stick[i], frames[i]], axis=2)
        p = os.path.join(out_dir, f"{tag}{i}.mp4")
        write_video(grid, p, fps=fps)
        paths[f"{tag}{i}"] = p
    return paths


def visualize_mtvae(model, net_params, batch, out_dir: str, key,
                    norm_stats=None, n_vids: int = 2, n_samples: int = 3,
                    fps: int = 12, tag: str = "") -> Dict[str, str]:
    """MTVAE video suite (reference lib/logging_mtvae.py:574
    visualize_transfer3d variant): per sequence, rows = GT future /
    reconstruction / prior samples, decoded from the conditioning prefix."""
    kps = jnp.asarray(batch["keypoints"], jnp.float32)[:n_vids]
    cross = jnp.asarray(batch.get("paired_keypoints",
                                  batch["keypoints"]),
                        jnp.float32)[:n_vids]
    B = kps.shape[0]

    @jax.jit
    def rollouts(net_params, kps, cross, key):
        k1, *k_s = jax.random.split(key, 1 + n_samples)
        recon, *_ = model.apply({"params": net_params}, kps, cross,
                                rngs={"sample": k1})
        samples = [model.apply({"params": net_params}, kps, cross,
                               sample_prior=True, rngs={"sample": k})[0]
                   for k in k_s]
        return recon, jnp.stack(samples, 1)  # (B, S, T, K)

    recon, samples = rollouts(net_params, kps, cross, key)

    def to_world(flat):
        arr = np.asarray(flat)
        if norm_stats is not None:
            arr = np.asarray(unnormalize(arr, norm_stats))
        return arr.reshape(arr.shape[:-1] + (-1, 3))

    gt_w = to_world(np.asarray(kps[:, model.n_cond:]))
    rec_w = to_world(recon)
    samp_w = to_world(samples)
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for i in range(B):
        rows = [create_video_3d(gt_w[i], fps=fps),
                create_video_3d(rec_w[i], fps=fps)]
        rows += [create_video_3d(samp_w[i, s], fps=fps)
                 for s in range(n_samples)]
        out = os.path.join(out_dir, f"{tag}mtvae_seq{i}.mp4")
        write_video(make_eval_grid(rows).astype(np.uint8), out, fps=fps)
        paths[f"{tag}mtvae_seq{i}"] = out
    return paths


def latent_interpolate_videos(model, net_params, batch, out_dir: str, key,
                              seq_len: int, norm_stats=None,
                              n_steps: int = 5, fps: int = 12,
                              tag: str = "") -> str:
    """Slerp between two sequences' behavior latents and decode each
    interpolant from the first sequence's start pose — one grid video
    (reference latent_interpolate, lib/logging.py:909-1202)."""
    from ..viz.latent import latent_interpolate

    kps = jnp.asarray(batch["keypoints"], jnp.float32)[:2]
    seq = kps[:, :-1]
    _, mu, _, _ = model.apply({"params": net_params}, seq, sample=False,
                              rngs={"sample": key},
                              method=model.infer_b)
    path_b = jnp.asarray(latent_interpolate(np.asarray(mu[0]),
                                            np.asarray(mu[1]), n_steps))
    starts = jnp.tile(seq[0:1, 0:1], (n_steps, 1, 1))
    xs, _ = model.apply({"params": net_params}, path_b, starts, seq_len,
                        method=model.generate_seq)

    def to_world(flat):
        arr = np.asarray(flat)
        if norm_stats is not None:
            arr = np.asarray(unnormalize(arr, norm_stats))
        return arr.reshape(arr.shape[:-1] + (-1, 3))

    world = to_world(xs)
    rows = [create_video_3d(world[i], fps=fps) for i in range(n_steps)]
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{tag}latent_interp.mp4")
    write_video(make_eval_grid(rows).astype(np.uint8), out, fps=fps)
    return out


def get_synth_input(dataset, idx: int, spatial_size: int = 0):
    """Sample appearance image + camera for RGB rendering from a dataset's
    complete datadict (reference get_synth_input[_fix],
    lib/logging.py:1439-1545): returns (app_img [-1,1], extrinsics,
    intrinsics, image_size) for one sample.  The appearance is resized to
    ``spatial_size`` when given (>0), else to the dataset's own size."""
    dd = (dataset.complete_datadict
          if dataset.complete_datadict is not None else dataset.datadict)
    # image must come from the SAME dict the camera params index into
    # (the complete dict is larger than the camera-reduced datadict)
    import cv2

    img = cv2.imread(str(dd["img_paths"][idx]))
    if img is None:
        raise FileNotFoundError(dd["img_paths"][idx])
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    size = int(spatial_size) if spatial_size else dataset.spatial_size
    if img.shape[0] != size or img.shape[1] != size:
        img = cv2.resize(img, (size, size),
                         interpolation=cv2.INTER_LINEAR)
    app = dataset._to_float(img)
    extr = np.asarray(dd["extrinsics_univ"][idx], np.float32)
    intr = np.asarray(dd["intrinsics_univ"][idx], np.float32)
    imsize = np.asarray(dd["image_size"][idx], np.float32)
    return app, extr, intr, imsize


def get_synth_input_all_cameras(dataset, rng=None, spatial_size: int = 0):
    """One (appearance, extrinsics, intrinsics, image_size) tuple per
    DISTINCT camera, appearance fixed to one random person seen from each
    camera (reference get_synth_input(all_cameras=True),
    lib/logging.py:1473-1514).  Returns stacked arrays
    (C,S,S,3)/(C,3,4)/(C,4)/(C,2); falls back to [get_synth_input(0)] when
    the dataset has no camera ids (or no person ids to pin)."""
    rng = rng or np.random.RandomState(0)
    dd = (dataset.complete_datadict
          if getattr(dataset, "complete_datadict", None) is not None
          else dataset.datadict)
    persons = np.unique(dd["p_ids"]) if "p_ids" in dd else np.empty(0)
    if ("camera_id" not in dd or "extrinsics_univ" not in dd
            or persons.size == 0):
        app, extr, intr, size = get_synth_input(dataset, 0, spatial_size)
        return (app[None], extr[None], intr[None], size[None])
    cameras = np.unique(dd["camera_id"])
    tpid = persons[rng.randint(len(persons))]
    apps, extrs, intrs, sizes = [], [], [], []
    for cam in cameras:
        sel = np.nonzero((dd["p_ids"] == tpid)
                         & (dd["camera_id"] == cam))[0]
        if sel.size == 0:  # person not seen by this camera
            sel = np.nonzero(dd["camera_id"] == cam)[0]
        tid = int(sel[0])
        app, extr, intr, size = get_synth_input(dataset, tid, spatial_size)
        apps.append(app)
        extrs.append(extr)
        intrs.append(intr)
        sizes.append(size)
    return (np.stack(apps), np.stack(extrs), np.stack(intrs),
            np.stack(sizes))


def load_run_checkpoint(run_dir: str, role: str):
    """Restore the latest checkpoint of ``role`` from a run directory as a
    raw pytree (no template needed), plus the run's config when found.

    Run layouts: <base>/<experiment>/{ckpt,config,...}/<project>.  Accepts
    the experiment dir (scans projects), a project's ckpt dir
    (<exp>/ckpt/<project> — the config is resolved from the sibling
    <exp>/config/<project>/config.yaml), or a direct orbax role dir."""
    import orbax.checkpoint as ocp

    from ..core.config import load_config

    run_dir = os.path.normpath(run_dir)
    candidates = []  # (ckpt_role_dir, [config_yaml_options])
    direct_cfg = os.path.join(run_dir, "config", "config.yaml")
    proj = os.path.basename(run_dir)
    sibling_cfg = os.path.join(os.path.dirname(os.path.dirname(run_dir)),
                               "config", proj, "config.yaml")
    candidates.append((os.path.join(run_dir, "ckpt", role), [direct_cfg]))
    candidates.append((os.path.join(run_dir, role),
                       [direct_cfg, sibling_cfg]))
    candidates.append((run_dir, [direct_cfg, sibling_cfg]))
    exp_ckpt = os.path.join(run_dir, "ckpt")
    if os.path.isdir(exp_ckpt):
        for prj in sorted(os.listdir(exp_ckpt)):
            candidates.append((
                os.path.join(exp_ckpt, prj, role),
                [os.path.join(run_dir, "config", prj, "config.yaml")]))
    for cand, cfg_paths in candidates:
        if not os.path.isdir(cand):
            continue
        mgr = ocp.CheckpointManager(os.path.abspath(cand))
        step = mgr.latest_step()
        if step is None:
            continue
        state = mgr.restore(step)  # raw pytree (no template)
        config = None
        for cp in cfg_paths:
            if cp and os.path.exists(cp):
                config = load_config(cp)
                break
        return state, config
    raise FileNotFoundError(f"no '{role}' checkpoint under {run_dir}")


def load_synth_params(run_dir: str):
    """Load a pretrained synthesis (cvbae/vunet) run's VUNet params + config
    for cross-model video rendering (reference behavior_net.py:84-99 loads
    --synth_model's checkpoint + config.yaml)."""
    state, config = load_run_checkpoint(run_dir, "reg_ckpt")
    return state["vunet"]["params"], config


# -- paper-figure entry points (reference lib/figures.py) -------------------


def make_enrollment_figures(pipeline, params, x_source, x_start, apps,
                            extrs, intrs, image_sizes, key, out_dir: str,
                            length: int = 50, disc_step: int = 6,
                            tag: str = "bid0-sid0") -> Dict[str, str]:
    """Multi-camera enrollment figure (reference make_enrollment_figure,
    lib/figures.py:458-686): re-enact ``x_source``'s behavior from
    ``x_start`` under EVERY camera in one batched compiled call (the
    camera axis rides the pipeline's batch axis — the TPU replacement of
    the reference's per-camera python loop), then write

      enrollment-<tag>.png          stickman filmstrip rows per camera
      enrollment-rgb-<tag>.png      RGB filmstrip rows per camera
      enrollment-overlay-<tag>.png  0.5/0.5 stickman+RGB overlay rows
      enrollment_vid-<tag>.mp4      cameras side by side, stick|rgb rows

    apps: (C, S, S, 3) appearance per camera; extrs (C, 3, 4);
    intrs (C, 4); image_sizes (C, 2); x_source (T, K); x_start (K,).
    """
    from ..viz.videos import filmstrip, save_png

    C = int(np.asarray(extrs).shape[0])
    src = jnp.tile(jnp.asarray(x_source, jnp.float32)[None], (C, 1, 1))
    start = jnp.tile(jnp.asarray(x_start, jnp.float32)[None], (C, 1))
    out = pipeline.reenact(params, src, start, jnp.asarray(apps),
                           jnp.asarray(extrs), jnp.asarray(intrs),
                           jnp.asarray(image_sizes), key, length=length)
    frames = frames_to_uint8(np.asarray(out["frames"], np.float32))
    stick = frames_to_uint8(np.asarray(out["stickman"], np.float32))

    os.makedirs(out_dir, exist_ok=True)
    paths: Dict[str, str] = {}
    stick_rows = np.concatenate(
        [filmstrip(stick[c], disc_step) for c in range(C)], axis=0)
    rgb_rows = np.concatenate(
        [filmstrip(frames[c], disc_step) for c in range(C)], axis=0)
    overlay = (0.5 * stick_rows.astype(np.float32)
               + 0.5 * rgb_rows.astype(np.float32)).astype(np.uint8)
    paths["kps"] = save_png(
        stick_rows, os.path.join(out_dir, f"enrollment-{tag}.png"))
    paths["rgb"] = save_png(
        rgb_rows, os.path.join(out_dir, f"enrollment-rgb-{tag}.png"))
    paths["overlay"] = save_png(
        overlay, os.path.join(out_dir, f"enrollment-overlay-{tag}.png"))

    vid = np.concatenate(
        [np.concatenate([stick[c], frames[c]], axis=1) for c in range(C)],
        axis=2)  # (T, 2H, C*W, 3)
    paths["video"] = write_video(
        vid, os.path.join(out_dir, f"enrollment_vid-{tag}.mp4"), fps=12)
    return paths


def latent_interpolate_eval_figures(pipeline, behavior_model, params,
                                    kps1, kps2, apps, extrs, intrs,
                                    image_sizes, key, out_dir: str,
                                    n_steps: int = 6, length: int = 50,
                                    disc_step: int = 6,
                                    tag: str = "") -> Dict[str, str]:
    """Inference-time latent interpolation figure (reference
    latent_interpolate_eval, lib/figures.py:687-1127): slerp AND linear
    paths between two sequences' behavior means, decoded from sequence 1's
    start pose under every camera. All (interp-step x camera) rollouts run
    as ONE batched pipeline call; writes per-camera filmstrip PNGs + mp4s.

    kps1/kps2: (T, K) normalized keypoint sequences.
    """
    from ..viz.latent import latent_interpolate, slerp  # noqa: F401
    from ..viz.videos import filmstrip, save_png

    seq1 = jnp.asarray(kps1, jnp.float32)[None, :-1]
    seq2 = jnp.asarray(kps2, jnp.float32)[None, :-1]
    _, mu1, _, _ = behavior_model.apply(
        {"params": params["behavior"]}, seq1, sample=False,
        rngs={"sample": key}, method=behavior_model.infer_b)
    _, mu2, _, _ = behavior_model.apply(
        {"params": params["behavior"]}, seq2, sample=False,
        rngs={"sample": jax.random.fold_in(key, 1)},
        method=behavior_model.infer_b)
    m1, m2 = np.asarray(mu1[0]), np.asarray(mu2[0])
    vals = np.linspace(0.0, 1.0, n_steps)
    b_slerp = latent_interpolate(m1, m2, n_steps)           # (n, H)
    b_linear = np.stack([(1 - v) * m1 + v * m2 for v in vals])

    C = int(np.asarray(extrs).shape[0])
    paths: Dict[str, str] = {}
    os.makedirs(out_dir, exist_ok=True)
    for name, bs in (("slerp", b_slerp), ("linear", b_linear)):
        # batch = n_steps x cameras in one compiled call
        b = jnp.asarray(np.repeat(bs, C, axis=0), jnp.float32)
        start = jnp.tile(seq1[:, 0], (n_steps * C, 1))
        app_b = jnp.tile(jnp.asarray(apps), (n_steps, 1, 1, 1))
        ex_b = jnp.tile(jnp.asarray(extrs), (n_steps, 1, 1))
        in_b = jnp.tile(jnp.asarray(intrs), (n_steps, 1))
        sz_b = jnp.tile(jnp.asarray(image_sizes), (n_steps, 1))
        out = pipeline.generate(params, b, start, app_b, ex_b, in_b, sz_b,
                                jax.random.fold_in(key, 2), length=length,
                                use_flow=False)
        frames = frames_to_uint8(np.asarray(out["frames"], np.float32))
        frames = frames.reshape((n_steps, C) + frames.shape[1:])
        for c in range(C):
            # rows = interpolation steps, cols = time
            strip = np.concatenate(
                [filmstrip(frames[s, c], disc_step)
                 for s in range(n_steps)], axis=0)
            paths[f"{name}_cam{c}_png"] = save_png(
                strip, os.path.join(
                    out_dir, f"{tag}interp-{name}-cam{c}.png"))
            vid = np.concatenate(list(frames[:, c]), axis=2)
            paths[f"{name}_cam{c}_mp4"] = write_video(
                vid, os.path.join(
                    out_dir, f"{tag}interp-{name}-cam{c}.mp4"), fps=12)
    return paths


def sample_examples_single_figures(pipeline, behavior_model, params,
                                   kps1, kps2, app, extr, intr,
                                   image_size, key, out_dir: str,
                                   n_samples: int = 4, length: int = 50,
                                   disc_step: int = 6,
                                   use_flow: bool = True,
                                   tag: str = "sid0") -> Dict[str, str]:
    """Diverse-futures figure for one start pose (reference
    sample_examples_single, lib/figures.py:1810-2127): from sequence 1's
    start pose render (a) the self-reconstruction from mu1, (b) the
    behavior swap from mu2, and (c) n prior/flow samples — all in one
    batched pipeline call — and write a filmstrip PNG (rows = variants)
    plus an mp4 under ``<out_dir>/sid_<tag>/``.
    """
    from ..viz.videos import filmstrip, save_png

    seq1 = jnp.asarray(kps1, jnp.float32)[None, :-1]
    seq2 = jnp.asarray(kps2, jnp.float32)[None, :-1]
    _, mu1, _, _ = behavior_model.apply(
        {"params": params["behavior"]}, seq1, sample=False,
        rngs={"sample": key}, method=behavior_model.infer_b)
    _, mu2, _, _ = behavior_model.apply(
        {"params": params["behavior"]}, seq2, sample=False,
        rngs={"sample": jax.random.fold_in(key, 1)},
        method=behavior_model.infer_b)
    H = mu1.shape[-1]
    z = jax.random.normal(jax.random.fold_in(key, 2), (n_samples, H))
    if use_flow and pipeline.flow_model is not None:
        bz = pipeline.flow_model.apply(
            params["flow"], z, method=pipeline.flow_model.reverse)
    else:
        bz = z
    b_all = jnp.concatenate([mu1, mu2, bz], axis=0)      # (2 + n, H)
    n_rows = int(b_all.shape[0])
    start = jnp.tile(seq1[:, 0], (n_rows, 1))
    app_b = jnp.tile(jnp.asarray(app)[None], (n_rows, 1, 1, 1))
    ex_b = jnp.tile(jnp.asarray(extr)[None], (n_rows, 1, 1))
    in_b = jnp.tile(jnp.asarray(intr)[None], (n_rows, 1))
    sz_b = jnp.tile(jnp.asarray(image_size)[None], (n_rows, 1))
    out = pipeline.generate(params, b_all, start, app_b, ex_b, in_b, sz_b,
                            jax.random.fold_in(key, 3), length=length,
                            use_flow=False)
    frames = frames_to_uint8(np.asarray(out["frames"], np.float32))

    sid_dir = os.path.join(out_dir, f"sid_{tag}")
    os.makedirs(sid_dir, exist_ok=True)
    strip = np.concatenate(
        [filmstrip(frames[r], disc_step) for r in range(n_rows)], axis=0)
    paths = {
        "png": save_png(strip,
                        os.path.join(sid_dir, f"samples-{tag}.png")),
        "mp4": write_video(
            np.concatenate(list(frames), axis=2),
            os.path.join(sid_dir, f"samples-{tag}.mp4"), fps=12),
    }
    return paths


def make_behavior_startpose_grid(model, net_params, batch, out_dir: str,
                                 key, seq_len: int, norm_stats=None,
                                 n_behaviors: int = 3, n_starts: int = 3,
                                 fps: int = 12, tag: str = "") -> str:
    """Behavior x start-pose grid video (reference make_eval_grid,
    lib/logging.py:1548-1867): row r shows behavior r re-enacted from every
    start pose c; row 0 / col 0 carry the ground-truth sources.  All
    n_behaviors x n_starts rollouts run in ONE batched jitted call (the
    reference loops the grid on the host).

    Returns the mp4 path.
    """
    kps = jnp.asarray(batch["keypoints"], jnp.float32)
    n_behaviors = min(n_behaviors, kps.shape[0])
    n_starts = min(n_starts, kps.shape[0])
    seqs = kps[:, :-1]

    @jax.jit
    def grid_rollouts(net_params, seqs, key):
        _, mu, _, _ = model.apply(
            {"params": net_params}, seqs[:n_behaviors], sample=False,
            rngs={"sample": key}, method=model.infer_b)
        # (R*C, H): behavior r repeated over start poses c
        b = jnp.repeat(mu, n_starts, axis=0)
        starts = jnp.tile(seqs[:n_starts, 0], (n_behaviors, 1))
        xs, _ = model.apply({"params": net_params}, b, starts[:, None],
                            seq_len, method=model.generate_seq)
        return xs.reshape(n_behaviors, n_starts, seq_len, -1)

    xs = grid_rollouts(net_params, seqs, key)

    def to_world(flat):
        arr = np.asarray(flat)
        if norm_stats is not None:
            arr = np.asarray(unnormalize(arr, norm_stats))
        return arr.reshape(arr.shape[:-1] + (-1, 3))

    grid_w = to_world(xs)                        # (R, C, T, K, 3)
    gt_w = to_world(np.asarray(seqs))            # (B, T, K, 3)

    rows = []
    # header row: blank cell + start-pose GT videos
    header = [np.full_like(create_video_3d(gt_w[0], fps=fps), 255)]
    header += [create_video_3d(gt_w[c], fps=fps) for c in range(n_starts)]
    rows.append(np.concatenate(_equal_t(header), axis=2))
    for r in range(n_behaviors):
        cells = [create_video_3d(gt_w[r], fps=fps)]  # behavior source
        cells += [create_video_3d(grid_w[r, c], fps=fps)
                  for c in range(n_starts)]
        rows.append(np.concatenate(_equal_t(cells), axis=2))
    grid_vid = np.concatenate(_equal_t(rows), axis=1)

    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{tag}eval_grid.mp4")
    write_video(grid_vid.astype(np.uint8), out, fps=fps)
    return out


def _equal_t(vids):
    t = min(v.shape[0] for v in vids)
    return [v[:t] for v in vids]
