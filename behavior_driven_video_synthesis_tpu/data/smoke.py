"""Dataset visual smoke tests — the reference's only QA machinery.

Runnable equivalent of the ``__main__`` blocks the reference drives with
config/test_datasets.yaml (reference data/human36m.py:1093-1354,
data/deepfashion.py:202-332, data/market.py:130-190):

  * ``visualize_projection`` — unnormalize poses -> (FK if angles) -> world
    -> extrinsics -> pinhole projection, skeleton overlaid on the dataset's
    real frames (black canvas when no images exist) + a 3D skeleton video.
    Verifies the whole geometry stack visually.  The per-frame numpy loop of
    the reference is one batched jitted geometry call here.
  * ``test_synth`` — pose/stickman/appearance triplets as PNG grids
    (verifying VUNet training inputs).
  * anything else — one loader batch rendered as a grid per image key.

Usage:
    python -m behavior_driven_video_synthesis_tpu.data.smoke \
        --config configs/test_datasets.yaml [--mode ...] [--out ./test_data]

Datasets resolve exactly like training: ``data.dataset`` +
``data.datapath``; ``h36m_synthetic`` (or a missing datapath) falls back to
the synthetic Human3.6M columns so the tool runs without the real dataset.
"""
from __future__ import annotations

import argparse
import os
from os import path

import numpy as np

from ..core.config import load_config
from ..geometry import (
    apply_affine_transform,
    camera_projection,
    forward_kinematics,
)
from ..geometry.normalization import unnormalize
from . import Loader, RandomSampler, SequenceSampler, get_dataset
from .human36m import Human36mDataset


def _build_h36m(dcfg, mode: str, data_keys):
    kwargs = {k: v for k, v in dcfg.items()
              if k not in ("dataset", "seq_length")}
    kwargs.setdefault("keypoint_type", "keypoints_3d_world")
    ds = Human36mDataset(None, data_keys,
                         tuple(dcfg.get("seq_length", (0, 0))),
                         mode=mode, **kwargs)
    if len(ds) == 0:
        from .synthetic import synthetic_h36m_columns

        ds.populate_from_arrays(synthetic_h36m_columns(
            n_frames_per_video=int(dcfg.get("n_frames_per_video", 120))))
    return ds


def _poses_world(ds, frame_ids: np.ndarray) -> np.ndarray:
    """Unnormalize the dataset's keypoint column back to world meters; FK
    when the column stores joint angles (reference human36m.py:1139-1192)."""
    kk = ds.keypoint_key
    flat = np.asarray(unnormalize(ds.datadict[kk][frame_ids], ds.norm_stats))
    if "angle" in kk:
        xyz = np.asarray(forward_kinematics(flat)) / 1000.0
        return xyz[:, np.asarray(ds.joint_model.kps_to_use)]
    return flat.reshape(len(frame_ids), -1, 3)


def visualize_projection(ds, out_dir: str, n_videos: int = 3,
                         win: int = 50, seed: int = 42):
    from ..viz import add_joints_to_img, create_video_3d, write_video

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    win = min(win, len(ds))
    starts = rng.choice(max(1, len(ds) - win), size=n_videos, replace=False)
    written = []
    for nr, start in enumerate(starts):
        ids = np.arange(start, start + win)
        world = _poses_world(ds, ids)
        extr = np.asarray(ds.datadict["extrinsics_univ"][ids], np.float64)
        intr = np.asarray(ds.datadict["intrinsics_univ"][ids], np.float64)
        cam = np.asarray(apply_affine_transform(world, extr[:, None]))
        px = np.asarray(camera_projection(cam, intr))

        frames = []
        for t, i in enumerate(ids):
            img = None
            p = str(ds.datadict["img_paths"][i]) if "img_paths" in \
                ds.datadict else ""
            if p and path.exists(p):
                import cv2

                img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            if img is None:
                size = (int(ds.datadict["image_size"][i][1]),
                        int(ds.datadict["image_size"][i][0]))
                img = np.zeros((size[0], size[1], 3), np.uint8)
            img = add_joints_to_img(
                np.ascontiguousarray(img), px[t],
                ds.joint_model.total_relative_joints,
                color_joints=[(0, 255, 0)])
            frames.append(img)
        vid_path = path.join(out_dir, f"test_video_kps_img#{nr}.mp4")
        write_video(np.stack(frames), vid_path)
        p3d = path.join(out_dir, f"kps_3d_world#{nr}.mp4")
        create_video_3d(world, out_path=p3d,
                        lines=ds.joint_model.total_relative_joints)
        written += [vid_path, p3d]
    return written


def test_synth_grids(ds, out_dir: str, n: int = 8, seed: int = 0):
    from ..viz import frames_to_uint8

    import cv2

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    ids = rng.choice(len(ds), size=min(n, len(ds)), replace=False)
    written = []
    for nr, i in enumerate(ids):
        item = ds[int(i)]
        row = []
        for key in ("pose_img", "stickman", "app_img"):
            img = np.asarray(item[key])
            if img.ndim == 4:
                img = img[0]
            if img.shape[-1] != 3:   # inplane part stack: show first part
                img = img[..., :3]
            row.append(frames_to_uint8(img[None])[0])
        grid = np.concatenate(row, axis=1)
        p = path.join(out_dir, f"synth_triplet#{nr}.png")
        cv2.imwrite(p, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
        written.append(p)
    return written


def stickman_grids(ds, out_dir: str, n: int = 8, seed: int = 0):
    """Stickman-from-3D grid for image-less (synthetic-column) runs."""
    from ..viz import frames_to_uint8, make_img_grid

    import cv2

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    ids = rng.choice(len(ds), size=min(n, len(ds)), replace=False)
    imgs = []
    for i in ids:
        st = np.asarray(ds[int(i)]["stickman"])
        if st.ndim == 4:
            st = st[0]
        imgs.append(frames_to_uint8(st[None])[0])
    grid = make_img_grid(np.stack(imgs), n_cols=4)
    p = path.join(out_dir, "stickman_from_3d.png")
    cv2.imwrite(p, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
    return [p]


def default_batch_grids(ds, out_dir: str, batch_size: int = 8):
    from ..viz import frames_to_uint8, make_img_grid

    import cv2

    os.makedirs(out_dir, exist_ok=True)
    sampler = SequenceSampler(ds, RandomSampler(ds, seed=0), batch_size,
                              drop_last=True)
    batch = next(iter(Loader(ds, sampler, num_workers=0)))
    written = []
    for key, arr in batch.items():
        arr = np.asarray(arr)
        if arr.ndim == 4 and arr.shape[-1] == 3:     # (B, H, W, 3)
            grid = make_img_grid(frames_to_uint8(arr), n_cols=4)
            p = path.join(out_dir, f"batch_{key}.png")
            cv2.imwrite(p, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
            written.append(p)
    return written


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="configs/test_datasets.yaml")
    ap.add_argument("--mode", default=None,
                    help="override general.mode from the config")
    ap.add_argument("--out", default="./test_data")
    ap.add_argument("--n_videos", type=int, default=3)
    args = ap.parse_args(argv)

    # restricted loader (core.config) — a config file must not be able to
    # construct arbitrary Python objects
    config = load_config(args.config)
    dcfg = dict(config["data"])
    mode = args.mode or config["general"].get("mode", "default")
    name = str(dcfg.get("dataset", "h36m_synthetic")).lower()

    is_h36m = name in ("human3.6m", "human36m", "h36m", "h36m_synthetic",
                       "synthetic")
    has_files = bool(dcfg.get("datapath")) and path.exists(
        path.join(str(dcfg.get("datapath")), "annot_export.h5")
        if is_h36m else path.join(str(dcfg.get("datapath")), "index.p"))

    if mode == "visualize_projection":
        ds = _build_h36m(dcfg, "test", ["keypoints", "sample_ids"])
        out = visualize_projection(
            ds, path.join(args.out, "human36m_full"),
            n_videos=args.n_videos)
    elif mode == "test_synth":
        keys = ["pose_img", "stickman", "app_img", "sample_ids"]
        if is_h36m and has_files:
            ds = _build_h36m({**dcfg, "keypoint_type": None,
                              "seq_length": (0, 0)}, "test", keys)
        elif is_h36m:
            # synthetic columns carry no image files: draw the stickmen
            # from projected 3D so the geometry path is still exercised
            ds = _build_h36m(
                {**dcfg, "use_3d_for_stickman": True,
                 "train_synthesis": True, "seq_length": (0, 0)}, "test",
                ["stickman", "sample_ids"])
            out = stickman_grids(ds, path.join(args.out, name))
            for p in out:
                print(p)
            return out
        else:
            ds = get_dataset({"dataset": name})(
                None, keys, (0, 0), mode="test",
                **{k: v for k, v in dcfg.items()
                   if k not in ("dataset", "seq_length")})
        out = test_synth_grids(ds, path.join(args.out, name))
    else:
        if is_h36m and not has_files:
            ds = _build_h36m(
                {**dcfg, "use_3d_for_stickman": True,
                 "train_synthesis": True, "seq_length": (0, 0)}, "test",
                ["stickman", "sample_ids"])
        elif is_h36m:
            ds = _build_h36m({**dcfg, "seq_length": (0, 0)}, "test",
                             ["pose_img", "stickman", "sample_ids"])
        else:
            ds = get_dataset({"dataset": name})(
                None, ["pose_img", "stickman", "sample_ids"], (0, 0),
                mode="test",
                **{k: v for k, v in dcfg.items()
                   if k not in ("dataset", "seq_length")})
        out = default_batch_grids(ds, path.join(args.out, name))
    for p in out:
        print(p)
    return out


if __name__ == "__main__":
    main()
