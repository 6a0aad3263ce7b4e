"""File-backed Human3.6M path: a real on-disk annot_export.h5 + jpg frames
exercises ``Human36mDataset._load_h36m_full`` end-to-end — the h5 attribute
map (ref data/human36m.py:460-501), path joining, 1-based frame ids, the
debug subset, per-camera reduction, mm->m conversion with the 32->17
keypoint reduction, z-score normalization, person/action splits, and the
image/stickman/camera fetchers on real files."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5 = pytest.importorskip("h5py")

from behavior_driven_video_synthesis_tpu.data import Loader, SequenceSampler
from behavior_driven_video_synthesis_tpu.data.human36m import (
    Human36mDataset,
)
from behavior_driven_video_synthesis_tpu.data.samplers import RandomSampler

SUBJECTS = (1, 5, 9)
ACTIONS = (2, 4)
CAMS = (54138969, 55011271)
N_FRAMES = 30
IMG_HW = 128

pytestmark = pytest.mark.e2e  # slow CLI tier: run with -m e2e


def _camera(cam_index: int):
    """Small rotation about y per camera; translation in mm."""
    th = 0.15 * cam_index
    R = np.array([[np.cos(th), 0, np.sin(th)],
                  [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    t = np.array([50.0 * cam_index, -30.0, 150.0])  # mm
    return np.hstack([R, t[:, None]])


def make_h36m_fixture(root):
    """Write jpgs + annot_export.h5 in the reference's column layout
    (ref data/human36m.py:460-481): 32-joint world poses in mm, two
    cameras, three subjects, two actions."""
    rng = np.random.RandomState(7)
    cols = {k: [] for k in
            ["frame_path", "pose_2d", "subject", "frame", "action",
             "subaction", "pose_normalized_2d", "camera", "image_size",
             "intrinsics_univ", "pose_3d", "pose_3d_world",
             "extrinsics_univ"]}
    os.makedirs(root, exist_ok=True)
    intr = np.array([140.0, IMG_HW / 2, 140.0, IMG_HW / 2])
    K = np.array([[intr[0], 0, intr[1]], [0, intr[2], intr[3]], [0, 0, 1.0]])
    for ci, cam in enumerate(CAMS):
        extr = _camera(ci)
        for pid in SUBJECTS:
            for act in ACTIONS:
                # smooth 32-joint world trajectory in millimetres,
                # ~2.5 m in front of the cameras
                base = rng.randn(32, 3) * 250.0 + np.array([0, 0, 2500.0])
                freq = rng.uniform(0.05, 0.3, (32, 3))
                phase = rng.uniform(0, 2 * np.pi, (32, 3))
                t = np.arange(N_FRAMES)[:, None, None]
                kps_w = base + 150.0 * np.sin(freq * t + phase)  # (N,32,3)

                cam_kps = kps_w @ extr[:, :3].T + extr[:, 3]
                px = (cam_kps / cam_kps[:, :, -1:]) @ K.T

                vdir = f"S{pid}/act{act}_1/cam_{cam}"
                os.makedirs(os.path.join(root, vdir), exist_ok=True)
                paths = []
                for i in range(N_FRAMES):
                    img = np.clip(
                        rng.rand(IMG_HW, IMG_HW, 3) * 60
                        + np.linspace(0, 195, IMG_HW)[None, :, None],
                        0, 255).astype(np.uint8)
                    rel = f"{vdir}/frame_{i + 1:06d}.jpg"
                    cv2.imwrite(os.path.join(root, rel), img)
                    paths.append(rel.encode("utf-8"))

                cols["frame_path"].append(np.asarray(paths))
                cols["pose_2d"].append(px[:, :, :2])
                cols["subject"].append(np.full(N_FRAMES, pid))
                cols["frame"].append(np.arange(N_FRAMES) + 1)  # 1-based
                cols["action"].append(np.full(N_FRAMES, act))
                cols["subaction"].append(np.full(N_FRAMES, 1))
                cols["pose_normalized_2d"].append(px[:, :, :2] / IMG_HW)
                cols["camera"].append(np.full(N_FRAMES, cam))
                cols["image_size"].append(
                    np.tile([IMG_HW, IMG_HW], (N_FRAMES, 1)))
                cols["intrinsics_univ"].append(np.tile(intr, (N_FRAMES, 1)))
                cols["pose_3d"].append(cam_kps)
                cols["pose_3d_world"].append(kps_w)
                cols["extrinsics_univ"].append(
                    np.tile(extr, (N_FRAMES, 1, 1)))
    with h5.File(os.path.join(root, "annot_export.h5"), "w") as f:
        for k, v in cols.items():
            f.create_dataset(k, data=np.concatenate(v, axis=0))
    return root


@pytest.fixture(scope="module")
def h36m_root(tmp_path_factory):
    return make_h36m_fixture(str(tmp_path_factory.mktemp("h36m")))


def make_ds(h36m_root, mode="train", keys=("keypoints", "sample_ids"),
            **kw):
    kw.setdefault("keypoint_type", "keypoints_3d_world")
    return Human36mDataset(
        None, list(keys), (0, 0), mode=mode, datapath=h36m_root,
        spatial_size=64, data_seed=0, **kw)


class TestH36MFullLoad:
    def test_person_split_and_camera_reduction(self, h36m_root):
        tr = make_ds(h36m_root, "train")
        te = make_ds(h36m_root, "test")
        # world keypoints + not train_synthesis -> reduced to ONE camera
        # (ref human36m.py:560-565)
        assert np.unique(tr.datadict["camera_id"]).size == 1
        # subjects 1,5 train / 9 test; 2 actions x 30 frames x 1 camera
        assert len(tr) == 2 * len(ACTIONS) * N_FRAMES
        assert len(te) == 1 * len(ACTIONS) * N_FRAMES
        assert set(np.unique(tr.datadict["p_ids"])) == {1, 5}
        assert set(np.unique(te.datadict["p_ids"])) == {9}
        # complete dict keeps all cameras for appearance transfer
        assert np.unique(tr.complete_datadict["camera_id"]).size == len(CAMS)

    def test_mm_to_m_and_normalization(self, h36m_root):
        ds = make_ds(h36m_root)
        # 32 joints reduced to the 17 kps_to_use, flattened, z-scored
        kps = ds.datadict["keypoints_3d_world"]
        assert kps.shape[1] == len(ds.norm_stats.dim_to_use)
        assert kps.shape[1] <= 51
        assert abs(float(kps.mean())) < 0.2 and 0.5 < float(kps.std()) < 2.0
        # stats are in metres after the mm -> m conversion
        assert 1.0 < float(np.abs(ds.data_mean).max()) < 10.0
        # extrinsics translation also converted to metres
        assert float(np.abs(ds.datadict["extrinsics_univ"][:, :, -1]).max()) \
            < 10.0

    def test_composite_video_ids(self, h36m_root):
        ds = make_ds(h36m_root)
        # v_ids are densified over the full (pre-split) retained-camera data:
        # 3 subjects x 2 actions = 6 videos; the train split keeps the 4
        # belonging to subjects 1 and 5
        assert np.unique(ds.datadict["v_ids"]).size == 4
        assert np.unique(ds.complete_datadict["v_ids"]).size == \
            len(CAMS) * len(SUBJECTS) * len(ACTIONS)
        # frames within a video are contiguous and 0-based after f_ids - 1
        assert ds.datadict["f_ids"].min() == 0

    def test_real_image_fetch(self, h36m_root):
        ds = make_ds(h36m_root, keys=("pose_img", "app_img", "sample_ids"))
        item = ds[3]
        assert item["pose_img"].shape == (64, 64, 3)
        assert item["pose_img"].min() >= -1.0 and item["pose_img"].max() <= 1.0
        assert np.std(item["pose_img"]) > 0.05  # decoded the actual jpg
        # img_paths were joined onto datapath and exist
        assert os.path.exists(ds.datadict["img_paths"][3])

    def test_camera_fetchers(self, h36m_root):
        ds = make_ds(h36m_root, keys=("intrinsics", "extrinsics",
                                      "sample_ids"))
        item = ds[0]
        assert item["intrinsics"].shape == (4,)
        assert item["extrinsics"].shape[-2:] == (3, 4)

    def test_debug_subset(self, h36m_root):
        ds = make_ds(h36m_root, debug=True)
        # <= 100 per (person, action); our videos are 30 frames so debug
        # keeps everything but must still pass through the subset path
        assert len(ds) == 2 * len(ACTIONS) * N_FRAMES

    def test_action_filter(self, h36m_root):
        ds = make_ds(h36m_root, actions_to_use=["Directions"])  # id 2
        assert set(np.unique(ds.datadict["action"])) == {2}
        ds2 = make_ds(h36m_root, actions_to_discard=["Directions"])
        assert 2 not in np.unique(ds2.datadict["action"])

    def test_stickman_from_3d(self, h36m_root):
        ds = Human36mDataset(
            None, ["stickman", "keypoints", "sample_ids"], (0, 0),
            mode="train", datapath=h36m_root, spatial_size=64,
            keypoint_type="keypoints_3d_world", use_3d_for_stickman=True,
            train_synthesis=True, data_seed=0)
        item = ds[5]
        st = item["stickman"]
        assert st.shape == (64, 64, 3)
        assert float(np.abs(st).max()) > 0.3  # something was drawn

    def test_loader_end_to_end(self, h36m_root):
        ds = make_ds(h36m_root, keys=("keypoints", "pose_img", "sample_ids"),
                     )
        sampler = SequenceSampler(ds, RandomSampler(ds, seed=0),
                                  batch_size=4, drop_last=True)
        loader = Loader(ds, sampler, num_workers=2)
        batch = next(iter(loader))
        assert batch["pose_img"].shape == (4, 64, 64, 3)
        assert batch["keypoints"].shape[0] == 4


# -- CLI end-to-end on the file-backed dataset ------------------------------

def _write_cfg(tmp_path, name, cfg):
    import yaml
    p = os.path.join(str(tmp_path), f"{name}.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    return p


def test_behavior_net_cli_on_h36m_files(h36m_root, tmp_path):
    """behavior_net trains through the CLI against a real on-disk
    annot_export.h5 — the exact entry path a user of the reference takes
    (reference main.py + data/human36m.py:460-)."""
    from behavior_driven_video_synthesis_tpu.main import main

    cfg = _write_cfg(tmp_path, "behavior_net", {
        "general": {"base_dir": os.path.join(str(tmp_path), "runs"),
                    "project_name": "h36m-files",
                    "experiment": "behavior_net", "seed": 0},
        "data": {"dataset": "human3.6m", "datapath": h36m_root,
                 "seq_length": [8, 9], "sequential_frame_lag": 1,
                 "keypoint_type": "keypoints_3d_world",
                 "use_person_split": True, "n_data_workers": 2},
        "architecture": {"dim_hidden_b": 32, "flow_mid_channels_factor": 2,
                         "n_flows": 2, "flow_hidden_depth": 1,
                         "decoder_arch": "lstm"},
        "training": {"batch_size": 8, "n_epochs": 2, "lr_init": 1e-4,
                     "flow_lr": 1e-6, "information_max": 10,
                     "gamma_init": 0.0, "gamma_step": 1e-5,
                     "use_regressor": False},
        "logging": {"n_epoch_eval": 10, "metrics_every": 1},
    })
    main(["--config", cfg, "--debug"])
    ckpt_root = os.path.join(str(tmp_path), "runs", "behavior_net", "ckpt",
                             "debug")
    assert os.path.isdir(os.path.join(ckpt_root, "reg_ckpt"))


def test_cvbae_cli_on_h36m_files(h36m_root, tmp_path):
    """The cvbae image experiment trains through the CLI with pose/app
    images decoded from the fixture's real jpgs and stickmen drawn from the
    h5's 2D poses (reference shape_and_pose_net.py data path)."""
    from behavior_driven_video_synthesis_tpu.main import main

    cfg = _write_cfg(tmp_path, "cvbae", {
        "general": {"base_dir": os.path.join(str(tmp_path), "runs"),
                    "project_name": "h36m-files",
                    "experiment": "cvbae", "seed": 0},
        "data": {"dataset": "human3.6m", "datapath": h36m_root,
                 "spatial_size": 32, "box_factor": 1,
                 "bottleneck_factor": 2, "n_data_workers": 2},
        "architecture": {"n_latent_scales": 2, "nf_start": 4, "nf_max": 8,
                         "subpixel_upsampling": True, "n_scales": 0,
                         "n_rnb": 2, "n_linear": 1},
        "training": {"batch_size": 8, "lr": 5e-4, "adam_betas": [0.5, 0.9],
                     "end_iteration": 4, "information_max": 10,
                     "gamma_step": 1e-5, "train_regressor": False,
                     "bf16": False, "dropout_prob": 0.0},
        "metrics": {"n_it_metrics": 1000},
        "logging": {"log_steps": 1000, "ckpt_steps": 1000,
                    "metrics_every": 1},
    })
    main(["--config", cfg, "--debug"])
    ckpt_root = os.path.join(str(tmp_path), "runs", "cvbae", "ckpt",
                             "debug", "reg_ckpt")
    assert os.path.isdir(ckpt_root) and any(os.scandir(ckpt_root))


class TestSynthInputAllCameras:
    def test_one_tuple_per_camera(self, h36m_root):
        from behavior_driven_video_synthesis_tpu.experiments.visualize import (
            get_synth_input_all_cameras,
        )

        ds = make_ds(h36m_root, keys=("keypoints", "app_img", "sample_ids"))
        apps, extrs, intrs, sizes = get_synth_input_all_cameras(
            ds, np.random.RandomState(0))
        assert apps.shape[0] == len(CAMS)
        assert extrs.shape == (len(CAMS), 3, 4)
        assert intrs.shape == (len(CAMS), 4)
        assert sizes.shape == (len(CAMS), 2)
        # the two cameras must actually differ
        assert np.abs(extrs[0] - extrs[1]).max() > 0
