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


def get_synth_input(dataset, idx: int, spatial_size: int):
    """Sample appearance image + camera for RGB rendering from a dataset's
    complete datadict (reference get_synth_input[_fix],
    lib/logging.py:1439-1545): returns (app_img [-1,1], extrinsics,
    intrinsics, image_size) for one sample."""
    dd = (dataset.complete_datadict
          if dataset.complete_datadict is not None else dataset.datadict)
    app = dataset._to_float(dataset._prep_image(int(idx)))
    extr = np.asarray(dd["extrinsics_univ"][idx], np.float32)
    intr = np.asarray(dd["intrinsics_univ"][idx], np.float32)
    imsize = np.asarray(dd["image_size"][idx], np.float32)
    return app, extr, intr, imsize


def load_synth_params(run_dir: str):
    """Load a pretrained synthesis (cvbae/vunet) run's VUNet params + config
    for cross-model video rendering (reference behavior_net.py:84-99 loads
    --synth_model's checkpoint + config.yaml)."""
    import orbax.checkpoint as ocp

    from ..core.config import load_config

    # run layouts: <base>/<experiment>/{ckpt,config,...}/<project>.  Accept
    # the experiment dir (scan projects), a project's ckpt dir, or a direct
    # orbax role dir.
    candidates = []  # (ckpt_role_dir, config_yaml_or_None)
    direct_cfg = os.path.join(run_dir, "config", "config.yaml")
    candidates.append((os.path.join(run_dir, "ckpt", "reg_ckpt"),
                       direct_cfg))
    candidates.append((os.path.join(run_dir, "reg_ckpt"), direct_cfg))
    candidates.append((run_dir, direct_cfg))
    exp_ckpt = os.path.join(run_dir, "ckpt")
    if os.path.isdir(exp_ckpt):
        for proj in sorted(os.listdir(exp_ckpt)):
            candidates.append((
                os.path.join(exp_ckpt, proj, "reg_ckpt"),
                os.path.join(run_dir, "config", proj, "config.yaml")))
    for cand, cfg_path in candidates:
        if not os.path.isdir(cand):
            continue
        mgr = ocp.CheckpointManager(os.path.abspath(cand))
        step = mgr.latest_step()
        if step is None:
            continue
        state = mgr.restore(step)  # raw pytree (no template)
        config = (load_config(cfg_path)
                  if cfg_path and os.path.exists(cfg_path) else None)
        return state["vunet"]["params"], config
    raise FileNotFoundError(f"no synthesis checkpoint under {run_dir}")
