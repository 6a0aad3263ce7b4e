"""Offline prep -> annot_export.h5 -> Human36mDataset round trip.

The reference's prep scripts (data/process.py + the half-dead
process_all.py) are supposed to produce the annotation h5 the dataset
consumes; here the export is a first-class, testable step."""
import os

import numpy as np
import pytest

pytest.importorskip("h5py")

from behavior_driven_video_synthesis_tpu.data.human36m import (
    Human36mDataset,
)
from behavior_driven_video_synthesis_tpu.data.prep.process import (
    fit_extrinsics,
    infer_camera_intrinsics,
    view_annotation_rows,
    write_annot_export,
)


def _camera(theta=0.2):
    R = np.array([[np.cos(theta), 0, np.sin(theta)],
                  [0, 1, 0],
                  [-np.sin(theta), 0, np.cos(theta)]])
    t = np.array([120.0, -40.0, 300.0])
    return np.hstack([R, t[:, None]])


def _view(rng, n=40, extr=None):
    extr = _camera() if extr is None else extr
    world = rng.randn(n, 32, 3) * 250.0 + np.array([0, 0, 2500.0])
    cam = world @ extr[:, :3].T + extr[:, 3]
    intr = np.array([1145.0, 512.0, 1143.0, 515.0])
    p = cam / cam[..., 2:]
    px = np.stack([p[..., 0] * intr[0] + intr[1],
                   p[..., 1] * intr[2] + intr[3]], axis=-1)
    return world, cam, px, intr, extr


def test_fit_extrinsics_recovers_camera():
    rng = np.random.RandomState(0)
    world, cam, _, _, extr = _view(rng)
    est = fit_extrinsics(world, cam)
    np.testing.assert_allclose(est, extr, atol=1e-8)


def test_infer_intrinsics_recovers_camera():
    rng = np.random.RandomState(1)
    _, cam, px, intr, _ = _view(rng)
    est = infer_camera_intrinsics(px, cam)
    np.testing.assert_allclose(est, intr, rtol=1e-6)


def test_export_then_load(tmp_path):
    """Rows from three subjects x two actions export to an h5 the full
    Human36mDataset loader consumes (splits, mm->m, normalization)."""
    rng = np.random.RandomState(2)
    rows = []
    for pid in (1, 5, 9):
        for act in (2, 4):
            world, cam, px, intr, extr = _view(rng, n=30)
            paths = [f"S{pid}/a{act}/img_{i:06d}.jpg" for i in range(30)]
            rows.append(view_annotation_rows(
                subject_id=pid, action_id=act, subaction_id=1,
                camera_id=54138969, frame_paths=paths,
                poses_3d_univ=cam, poses_3d_world=world,
                pose_2d=px, image_size=(1000, 1000)))
    out = write_annot_export(str(tmp_path / "d" / "annot_export.h5"), rows)
    assert os.path.exists(out)

    ds = Human36mDataset(
        None, ["keypoints", "sample_ids"], (0, 0), mode="train",
        datapath=str(tmp_path / "d"), spatial_size=64,
        keypoint_type="keypoints_3d_world")
    assert len(ds) == 2 * 2 * 30          # subjects 1,5 in train
    # intrinsics were inferred == supplied; extrinsics converted to metres
    np.testing.assert_allclose(ds.datadict["intrinsics_univ"][0],
                               [1145.0, 512.0, 1143.0, 515.0], rtol=1e-6)
    assert np.abs(ds.datadict["extrinsics_univ"][:, :, -1]).max() < 10
    item = ds[0]
    assert np.isfinite(item["keypoints"]).all()


def test_export_derives_missing_columns(tmp_path):
    """pose_2d can be derived from intrinsics and extrinsics can be fitted —
    the mono-only export path."""
    rng = np.random.RandomState(3)
    world, cam, px, intr, extr = _view(rng, n=20)
    rows = [view_annotation_rows(
        subject_id=1, action_id=2, subaction_id=1, camera_id=1,
        frame_paths=[f"f{i}.jpg" for i in range(20)],
        poses_3d_univ=cam, poses_3d_world=world, intrinsics=intr)]
    np.testing.assert_allclose(rows[0]["pose_2d"], px, rtol=1e-6)
    np.testing.assert_allclose(rows[0]["extrinsics_univ"][0], extr,
                               atol=1e-7)
    # and the reverse: intrinsics inferred from given pose_2d
    rows2 = [view_annotation_rows(
        subject_id=1, action_id=2, subaction_id=1, camera_id=1,
        frame_paths=[f"f{i}.jpg" for i in range(20)],
        poses_3d_univ=cam, poses_3d_world=world, pose_2d=px)]
    np.testing.assert_allclose(rows2[0]["intrinsics_univ"][0], intr,
                               rtol=1e-6)
