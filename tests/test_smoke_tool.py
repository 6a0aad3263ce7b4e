"""The dataset visual smoke-test tool (reference __main__ blocks driven by
config/test_datasets.yaml, data/human36m.py:1093-1354)."""
import os

import pytest

cv2 = pytest.importorskip("cv2")
h5 = pytest.importorskip("h5py")

from behavior_driven_video_synthesis_tpu.data.smoke import main

from test_h36m_files import make_h36m_fixture


@pytest.fixture(scope="module")
def h36m_root(tmp_path_factory):
    return make_h36m_fixture(str(tmp_path_factory.mktemp("h36m_smoke")))

pytestmark = pytest.mark.e2e  # slow CLI tier: run with -m e2e


def _cfg(tmp_path, data):
    import yaml

    p = os.path.join(str(tmp_path), "cfg.yaml")
    with open(p, "w") as f:
        yaml.safe_dump({"general": {"mode": "default"}, "data": data}, f)
    return p


def _assert_artifacts(paths):
    assert paths
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0, p


def test_visualize_projection_synthetic(tmp_path):
    cfg = _cfg(tmp_path, {"dataset": "h36m_synthetic",
                          "n_frames_per_video": 60})
    out = main(["--config", cfg, "--mode", "visualize_projection",
                "--out", str(tmp_path / "o"), "--n_videos", "1"])
    _assert_artifacts(out)
    assert any(p.endswith(".mp4") for p in out)


def test_test_synth_synthetic_fallback(tmp_path):
    cfg = _cfg(tmp_path, {"dataset": "h36m_synthetic",
                          "n_frames_per_video": 40, "spatial_size": 64})
    out = main(["--config", cfg, "--mode", "test_synth",
                "--out", str(tmp_path / "o")])
    _assert_artifacts(out)


def test_default_grid_synthetic(tmp_path):
    cfg = _cfg(tmp_path, {"dataset": "h36m_synthetic",
                          "n_frames_per_video": 40, "spatial_size": 64})
    out = main(["--config", cfg, "--out", str(tmp_path / "o")])
    _assert_artifacts(out)


def test_test_synth_file_backed(h36m_root, tmp_path):
    """With a real annot_export.h5 + jpgs the triplet grids decode the
    actual frames."""
    cfg = _cfg(tmp_path, {"dataset": "human3.6m", "datapath": h36m_root,
                          "spatial_size": 64})
    out = main(["--config", cfg, "--mode", "test_synth",
                "--out", str(tmp_path / "o")])
    _assert_artifacts(out)
    import numpy as np

    img = cv2.imread(out[0])
    assert img is not None and np.std(img[:, :64]) > 3  # real jpg content


def test_visualize_projection_file_backed_overlay(h36m_root, tmp_path):
    """Projection overlays land on the decoded real frames."""
    cfg = _cfg(tmp_path, {"dataset": "human3.6m", "datapath": h36m_root})
    out = main(["--config", cfg, "--mode", "visualize_projection",
                "--out", str(tmp_path / "o"), "--n_videos", "1"])
    _assert_artifacts(out)


def test_test_synth_deepfashion(tmp_path):
    """The non-H36M dataset branch (get_dataset + index.p fixture)."""
    from test_file_datasets import make_index_fixture

    root = make_index_fixture(str(tmp_path / "df"), n=10, size=64)
    cfg = _cfg(tmp_path, {"dataset": "deepfashion", "datapath": root,
                          "spatial_size": 32})
    out = main(["--config", cfg, "--mode", "test_synth",
                "--out", str(tmp_path / "o")])
    _assert_artifacts(out)
