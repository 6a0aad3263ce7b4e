"""File-backed dataset paths: DeepFashion/Market with a real on-disk
index.p + jpg fixture (exercises cv2.imread, BGR->RGB, resize, augment,
in-plane part stacks, and the loader end-to-end)."""
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from behavior_driven_video_synthesis_tpu.data import Loader, SequenceSampler
from behavior_driven_video_synthesis_tpu.data.deepfashion import (
    DeepFashionDataset,
)
from behavior_driven_video_synthesis_tpu.data.market import MarketDataset
from behavior_driven_video_synthesis_tpu.data.samplers import RandomSampler


def make_index_fixture(root, n=12, size=256, seed=0):
    """Write n jpgs + an index.p in the reference's format."""
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    imgs, joints, train = [], [], []
    for i in range(n):
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        name = f"img_{i:04d}.jpg"
        cv2.imwrite(os.path.join(root, name), img)
        imgs.append(name)
        joints.append(rng.uniform(0.1, 0.9, (18, 2)))
        train.append(i % 4 != 0)  # 75/25 split
    with open(os.path.join(root, "index.p"), "wb") as f:
        pickle.dump({"imgs": imgs, "joints": np.asarray(joints),
                     "train": train}, f)
    return root


@pytest.fixture(scope="module")
def df_root(tmp_path_factory):
    return make_index_fixture(str(tmp_path_factory.mktemp("df")), size=256)


class TestDeepFashionFiles:
    def test_train_test_split_and_len(self, df_root):
        tr = DeepFashionDataset(None, ["pose_img"], (0, 0), mode="train",
                                datapath=df_root, spatial_size=64)
        te = DeepFashionDataset(None, ["pose_img"], (0, 0), mode="test",
                                datapath=df_root, spatial_size=64)
        assert len(tr) + len(te) == 12
        assert len(tr) > len(te)

    def test_item_pixels_and_augment(self, df_root):
        ds = DeepFashionDataset(
            None, ["pose_img", "stickman", "app_img", "pose_img_inplane"],
            (0, 0), mode="train", datapath=df_root, spatial_size=64,
            data_seed=0)
        item = ds[0]
        for key in ("pose_img", "stickman", "app_img", "pose_img_inplane"):
            assert item[key].shape == (64, 64, 3), key
            assert item[key].min() >= -1.0 and item[key].max() <= 1.0
        # pose_img actually contains the decoded jpg (not zeros)
        assert np.std(item["pose_img"]) > 0.05
        # augmented variant differs from the plain image
        assert np.abs(item["pose_img_inplane"] - item["pose_img"]).max() \
            > 0.05

    def test_inplane_part_stack_from_files(self, df_root):
        ds = DeepFashionDataset(
            None, ["pose_img", "app_img"], (0, 0), mode="train",
            datapath=df_root, spatial_size=64, inplane_normalize=True,
            box_factor=2, data_seed=0)
        item = ds[0]
        assert item["app_img"].shape == (16, 16, 30)

    def test_loader_end_to_end(self, df_root):
        ds = DeepFashionDataset(
            None, ["pose_img", "stickman", "app_img", "sample_ids"],
            (0, 0), mode="train", datapath=df_root, spatial_size=64,
            data_seed=0)
        sampler = SequenceSampler(ds, RandomSampler(ds, seed=0),
                                  batch_size=4, seed=0)
        batch = next(iter(Loader(ds, sampler, num_workers=2)))
        assert batch["pose_img"].shape == (4, 64, 64, 3)
        assert batch["stickman"].shape == (4, 64, 64, 3)


class TestMarketFiles:
    def test_market_loads_and_augments(self, tmp_path):
        root = make_index_fixture(str(tmp_path / "mkt"), n=8, size=128,
                                  seed=1)
        ds = MarketDataset(
            None, ["pose_img", "stickman", "pose_img_inplane"], (0, 0),
            mode="train", datapath=root, spatial_size=128, data_seed=0)
        assert len(ds) > 0
        item = ds[0]
        assert item["pose_img"].shape == (128, 128, 3)
        assert item["pose_img_inplane"].shape == (128, 128, 3)
