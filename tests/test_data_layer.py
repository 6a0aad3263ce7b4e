"""Data layer tests: H36M column processing, windowing, pairing, samplers,
loader, stickman rendering (host + device)."""
import numpy as np
import pytest

import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.data import (
    Human36mDataset,
    SequenceSampler,
    RandomSampler,
    ReconstructionSampler,
    Loader,
    get_dataset,
)
from behavior_driven_video_synthesis_tpu.geometry.stickman import (
    render_stickman,
)

N_PER_VIDEO = 120
SPATIAL = 64


def synth_h36m_columns(rng, n_videos=6):
    """Synthetic H36M-like columns: 2 subjects x 3 train-actions, one
    camera, smooth 3D world trajectories (meters)."""
    cols = {k: [] for k in ["keypoints_3d_world", "p_ids", "f_ids", "action",
                            "subaction", "camera_id", "image_size",
                            "intrinsics_univ", "extrinsics_univ",
                            "img_paths"]}
    subjects = [1, 5]
    actions = [2, 4, 5]  # all in the 'train' action split
    vid = 0
    for pid in subjects:
        for act in actions:
            base = rng.randn(17, 3) * 0.3 + np.array([0, 0, 4.0])
            freq = rng.uniform(0.05, 0.3, (17, 3))
            phase = rng.uniform(0, 2 * np.pi, (17, 3))
            t = np.arange(N_PER_VIDEO)[:, None, None]
            kps = base + 0.2 * np.sin(freq * t + phase)
            cols["keypoints_3d_world"].append(kps)
            cols["p_ids"].append(np.full(N_PER_VIDEO, pid))
            cols["f_ids"].append(np.arange(N_PER_VIDEO) + 1)
            cols["action"].append(np.full(N_PER_VIDEO, act))
            cols["subaction"].append(np.full(N_PER_VIDEO, 1))
            cols["camera_id"].append(np.full(N_PER_VIDEO, 54138969))
            cols["image_size"].append(
                np.tile([1000, 1000], (N_PER_VIDEO, 1)))
            cols["intrinsics_univ"].append(
                np.tile([1145.0, 500.0, 1143.0, 500.0], (N_PER_VIDEO, 1)))
            extr = np.hstack([np.eye(3), np.zeros((3, 1))])
            cols["extrinsics_univ"].append(
                np.tile(extr, (N_PER_VIDEO, 1, 1)))
            cols["img_paths"].append(
                np.asarray([f"video_{vid}/frame_{i:06d}.jpg"
                            for i in range(N_PER_VIDEO)]))
            vid += 1
    return {k: np.concatenate(v, axis=0) for k, v in cols.items()}


@pytest.fixture(scope="module")
def h36m():
    rng = np.random.RandomState(3)
    ds = Human36mDataset(
        transforms=None,
        data_keys=["keypoints", "paired_keypoints", "action", "sample_ids",
                   "paired_sample_ids"],
        seq_length=(10, 11),
        mode="train",
        keypoint_type="keypoints_3d_world",
        small_joint_model=False,
        use_person_split=True,
        label_transfer=True,
        sequential_frame_lag=2,
        spatial_size=SPATIAL,
        data_seed=0,
    )
    ds.populate_from_arrays(synth_h36m_columns(rng))
    return ds


class TestH36MProcessing:
    def test_registry(self):
        assert get_dataset({"dataset": "Human3.6m"}) is Human36mDataset

    def test_columns_normalized(self, h36m):
        kps = h36m.datadict["keypoints_3d_world"]
        assert kps.shape[1] == len(h36m.dim_to_use)
        assert kps.shape[1] <= 51
        np.testing.assert_allclose(kps.mean(axis=0), 0.0, atol=0.2)

    def test_v_ids_dense_and_contiguous(self, h36m):
        v = h36m.datadict["v_ids"]
        assert v.min() == 0
        # frames of one video are contiguous
        for vid in np.unique(v):
            idx = np.where(v == vid)[0]
            assert np.all(np.diff(idx) == 1)

    def test_person_split(self, h36m):
        assert set(np.unique(h36m.datadict["p_ids"])) <= {1, 5, 6, 7, 8}

    def test_window_inside_video(self, h36m):
        for anchor in [0, 50, N_PER_VIDEO - 1, N_PER_VIDEO * 2 - 5]:
            ids = h36m._sample_valid_seq_ids([anchor, 10])
            assert len(ids) == 11  # anchor + seq_len
            vids = h36m.datadict["v_ids"][ids]
            assert len(np.unique(vids)) == 1, f"window crossed video @ {anchor}"

    def test_window_boundary_clamps(self, h36m):
        last = N_PER_VIDEO - 1  # last frame of first video
        ids = h36m._sample_valid_seq_ids([last, 10])
        assert ids[-1] <= last
        assert len(ids) == 11

    def test_label_transfer_pairs_differ_in_action(self, h36m):
        dd = h36m.datadict
        pairs = dd["map_ids"]
        assert np.all(dd["action"][pairs] != dd["action"])

    def test_getitem_contract(self, h36m):
        item = h36m[[0, 10]]
        assert item["keypoints"].shape == (11, len(h36m.dim_to_use))
        assert item["paired_keypoints"].shape == (11, len(h36m.dim_to_use))
        assert item["action"].shape == (11,)

    def test_loader_batches(self, h36m):
        sampler = SequenceSampler(h36m, RandomSampler(h36m, seed=0),
                                  batch_size=8, seed=1)
        loader = Loader(h36m, sampler, num_workers=4)
        batch = next(iter(loader))
        T = batch["keypoints"].shape[1]
        assert batch["keypoints"].shape == (8, T, len(h36m.dim_to_use))
        assert 10 <= T - 1 <= 11 or T == 11
        assert batch["action"].shape == (8, T)

    def test_reconstruction_sampler_identity(self, h36m):
        ReconstructionSampler(h36m)
        np.testing.assert_array_equal(h36m.datadict["map_ids"],
                                      np.arange(len(h36m)))
        h36m.resample_map_ids()  # restore pairing for other tests


class TestStickman:
    def test_stickman_from_3d(self):
        rng = np.random.RandomState(4)
        ds = Human36mDataset(
            transforms=None,
            data_keys=["keypoints", "stickman"],
            seq_length=(4, 5),
            mode="train",
            keypoint_type="keypoints_3d_world",
            use_3d_for_stickman=True,
            train_synthesis=True,
            spatial_size=SPATIAL,
            stickman_scale=16,
            data_seed=0,
        )
        ds.populate_from_arrays(synth_h36m_columns(rng))
        item = ds[[0, 4]]
        st = item["stickman"]
        assert st.shape == (5, SPATIAL, SPATIAL, 3)
        assert st.max() > -1.0  # something was drawn
        assert st.min() >= -1.0 and st.max() <= 1.0

    def test_diff_line_colors(self):
        """diff_line_colors (reference base_dataset.py:149-162): each limb
        line gets a distinct single-channel color from get_line_colors."""
        from behavior_driven_video_synthesis_tpu.geometry.stickman import (
            get_line_colors, make_joint_img,
        )
        rng = np.random.RandomState(6)
        ds = Human36mDataset(
            transforms=None, data_keys=["keypoints", "stickman"],
            seq_length=(4, 5), mode="train",
            keypoint_type="keypoints_3d_world", use_3d_for_stickman=True,
            train_synthesis=True, spatial_size=SPATIAL, stickman_scale=16,
            data_seed=0, diff_line_colors=True,
        )
        ds.populate_from_arrays(synth_h36m_columns(rng))
        jm = ds.joint_model
        lc = get_line_colors((len(jm.left_lines), len(jm.right_lines),
                              len(jm.head_lines) + len(jm.face)))
        assert ds.line_colors == lc
        # reference formula: line j in channel c -> (j+1)*(255//(n+1))
        n = len(jm.left_lines)
        assert lc[0][0] == [255 // (n + 1), 0, 0]
        assert all(int(np.count_nonzero(col)) == 1
                   for group in lc for col in group)
        item = ds[[0, 4]]
        st = item["stickman"]
        assert st.shape == (5, SPATIAL, SPATIAL, 3)
        # drawn intensities come from the distinct color table, so the
        # plain 255/127 line scheme must NOT be the only intensity present
        px = ds._get_kps_for_rendering(0)
        img_diff = make_joint_img((SPATIAL, SPATIAL, 3), px, jm,
                                  line_colors=lc, scale_factor=16)
        img_plain = make_joint_img((SPATIAL, SPATIAL, 3), px, jm,
                                   scale_factor=16)
        assert img_diff.sum() > 0
        assert not np.array_equal(img_diff, img_plain)
        vals = set(np.unique(img_diff)) - {0}
        assert any(v not in (127, 255) for v in vals), vals

    def test_device_renderer_matches_cv2(self):
        """Device rasterizer vs cv2 on the same skeleton: high IoU of drawn
        pixels."""
        rng = np.random.RandomState(5)
        ds = Human36mDataset(
            transforms=None, data_keys=["keypoints"], seq_length=(4, 5),
            mode="train", keypoint_type="keypoints_3d_world",
            spatial_size=SPATIAL, data_seed=0,
        )
        ds.populate_from_arrays(synth_h36m_columns(rng))
        px = ds._get_kps_for_rendering(0)
        from behavior_driven_video_synthesis_tpu.geometry.stickman import (
            make_joint_img,
        )
        host = make_joint_img((SPATIAL, SPATIAL, 3), px, ds.joint_model,
                              scale_factor=16)
        dev = np.asarray(render_stickman(
            jnp.asarray(px)[None], ds.joint_model, SPATIAL,
            thickness=SPATIAL / 16))[0]
        h_mask = host.sum(-1) > 0
        d_mask = dev.sum(-1) > 0
        iou = (h_mask & d_mask).sum() / max((h_mask | d_mask).sum(), 1)
        assert iou > 0.55, f"device/host stickman IoU too low: {iou:.3f}"


def test_matched_map_ids_same_action(h36m):
    """matched_keypoints pairs must come from the SAME action (the
    label-transfer pairs come from different actions)."""
    rng = np.random.RandomState(9)
    ds = Human36mDataset(
        transforms=None,
        data_keys=["keypoints", "matched_keypoints", "action"],
        seq_length=(5, 6), mode="train",
        keypoint_type="keypoints_3d_world", label_transfer=True,
        spatial_size=SPATIAL, data_seed=0,
    )
    ds.populate_from_arrays(synth_h36m_columns(rng))
    assert ds.matched_map_ids is not None
    acts = ds.datadict["action"]
    assert np.all(acts[ds.matched_map_ids] == acts)
    item = ds[[0, 5]]
    assert item["matched_keypoints"].shape == item["keypoints"].shape


def test_pose_encoding_sequence_matching(h36m):
    """With pose encodings attached, matched_keypoints returns the nearest
    same-action subsequence under the embedding metric."""
    rng = np.random.RandomState(11)
    ds = Human36mDataset(
        transforms=None,
        data_keys=["keypoints", "matched_keypoints", "action"],
        seq_length=(6, 7), mode="train",
        keypoint_type="keypoints_3d_world", label_transfer=True,
        sequential_frame_lag=1, spatial_size=SPATIAL, data_seed=0,
    )
    ds.populate_from_arrays(synth_h36m_columns(rng))
    # embeddings = the normalized keypoints themselves
    ds.set_pose_encodings(ds.datadict["keypoints_3d_world"])
    ids = ds._sample_valid_seq_ids([3, 6])
    matched = ds._match_subsequence(ids)
    assert len(matched) == len(ids)
    # matched frames share the anchor's action
    a = ds.datadict["action"]
    assert np.all(a[matched] == a[ids[0]])
    # the matched window must be at least as close as a random same-action
    # window of the SAME video it was chosen from
    base = ds.pose_encodings[ids]
    d_best = np.mean(np.linalg.norm(ds.pose_encodings[matched] - base,
                                    axis=-1))
    vid = ds.datadict["v_ids"][matched[0]]
    vid_idx = np.where(ds.datadict["v_ids"] == vid)[0]
    rand_start = vid_idx[0] + 20
    rand_win = np.arange(rand_start, rand_start + len(ids))
    d_rand = np.mean(np.linalg.norm(ds.pose_encodings[rand_win] - base,
                                    axis=-1))
    assert d_best <= d_rand + 1e-6
    item = ds[[3, 6]]
    assert item["matched_keypoints"].shape == item["keypoints"].shape


def test_h36m_synthetic_factory_modes():
    """h36m_synthetic exercises the full H36M pipeline (cameras, splits)
    without the real dataset; both splits must be non-empty."""
    from behavior_driven_video_synthesis_tpu.core import Config
    from behavior_driven_video_synthesis_tpu.experiments.data_factory import (
        build_sequence_data,
    )
    cfg = Config({"general": {},
                  "data": {"dataset": "h36m_synthetic",
                           "seq_length": (8, 9),
                           "sequential_frame_lag": 2,
                           "n_frames_per_video": 60},
                  "training": {"batch_size": 4}})
    for mode in ("train", "test"):
        loader, meta = build_sequence_data(cfg, mode)
        batch = next(iter(loader))
        assert batch["keypoints"].shape[0] == 4
        assert meta["n_kps"] == 51
        assert meta["norm_stats"] is not None


class TestPrefetchIter:
    def test_order_and_prepare(self):
        from behavior_driven_video_synthesis_tpu.data.loader import (
            prefetch_iter,
        )

        out = list(prefetch_iter(iter(range(20)), lambda x: x * 2, n=3))
        assert out == [x * 2 for x in range(20)]

    def test_abandon_mid_iteration_does_not_hang(self):
        import threading

        from behavior_driven_video_synthesis_tpu.data.loader import (
            prefetch_iter,
        )

        n_before = threading.active_count()
        for _ in range(5):
            it = prefetch_iter(iter(range(1000)), n=1)
            assert next(it) == 0
            it.close()  # consumer breaks out of the epoch
        import time

        deadline = time.time() + 10
        while threading.active_count() > n_before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= n_before + 1

    def test_producer_exception_reraises(self):
        import pytest

        from behavior_driven_video_synthesis_tpu.data.loader import (
            prefetch_iter,
        )

        def boom(x):
            if x == 3:
                raise ValueError("bad batch")
            return x

        with pytest.raises(ValueError, match="bad batch"):
            list(prefetch_iter(iter(range(10)), boom))
