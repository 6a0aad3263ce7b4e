"""Dataset/loader construction shared by the experiment drivers."""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..data import (
    Human36mDataset,
    Loader,
    RandomSampler,
    SequenceSampler,
    SyntheticSequenceDataset,
)


class SyntheticLoaderAdapter:
    """Gives SyntheticSequenceDataset the Loader iteration contract."""

    def __init__(self, ds: SyntheticSequenceDataset, batch_size: int,
                 seed: int = 0):
        self.ds = ds
        self.batch_size = batch_size
        self.seed = seed
        self._epoch = 0
        self.dim_to_use = ds.dim_to_use
        self.action_id_to_action = ds.action_id_to_action

    def __len__(self):
        return len(self.ds) // self.batch_size

    def __iter__(self):
        self._epoch += 1
        return self.ds.batches(self.batch_size,
                               seed=self.seed + self._epoch)


def normalize_action_labels(action: np.ndarray,
                            offset: Optional[int] = None) -> np.ndarray:
    """(B,) or (B, T) raw labels -> (B,) 0-based int labels.

    H36M action ids start at 2 (reference uses ``labels = action[:,0] - 2``,
    behavior_net.py:612)."""
    if action.ndim == 2:
        action = action[:, 0]
    if offset is None:
        offset = int(action.min())
    return (action - offset).astype(np.int64)


def build_sequence_data(config, mode: str = "train",
                        data_keys=None) -> Tuple[object, Dict]:
    """Returns (loader, meta) for keypoint-sequence experiments."""
    dcfg = config.data
    batch_size = int(config.training.batch_size)
    name = str(dcfg.get("dataset", "synthetic")).lower()
    seq_length = tuple(dcfg.get("seq_length", (50, 51)))

    if name == "synthetic":
        n_kps = int(dcfg.get("n_kps", 51))
        n_actions = int(dcfg.get("n_actions", 10))
        n_samples = int(dcfg.get("n_samples",
                                 2048 if mode == "train" else 512))
        if config.general.get("debug", False):
            n_samples = min(n_samples, 8 * batch_size)
        ds = SyntheticSequenceDataset(
            n_samples=n_samples,
            seq_length=seq_length[0] + 1,
            n_kps=n_kps, n_actions=n_actions,
            seed=0 if mode == "train" else 1,
        )
        loader = SyntheticLoaderAdapter(ds, batch_size)
        meta = {"n_kps": n_kps, "n_actions": n_actions, "dataset": ds,
                "norm_stats": None, "seq_len": seq_length[0],
                "action_offset": 0}
        return loader, meta

    if name in ("human3.6m", "human36m", "h36m", "h36m_synthetic"):
        data_keys = data_keys or ["keypoints", "paired_keypoints", "action",
                                  "sample_ids", "paired_sample_ids"]
        kwargs = {k: v for k, v in dcfg.items()
                  if k not in ("dataset", "seq_length")}
        kwargs.setdefault("label_transfer", True)
        kwargs.setdefault("keypoint_type", "keypoints_3d_world")
        ds = Human36mDataset(
            transforms=None, data_keys=data_keys, seq_length=seq_length,
            mode=mode, debug=config.general.get("debug", False), **kwargs)
        if name == "h36m_synthetic":
            from ..data.synthetic import synthetic_h36m_columns

            ds.populate_from_arrays(synthetic_h36m_columns(
                n_frames_per_video=int(dcfg.get("n_frames_per_video", 120)),
                seed=0 if mode == "train" else 1))
        if len(ds) == 0:
            raise FileNotFoundError(
                f"Human3.6M annot_export.h5 not found under "
                f"{dcfg.get('datapath')} — use dataset: synthetic or "
                f"provide the processed dataset (see data/prep).")
        sampler = SequenceSampler(ds, RandomSampler(ds), batch_size,
                                  drop_last=True)
        loader = Loader(ds, sampler,
                        num_workers=int(dcfg.get("n_data_workers", 8)))
        meta = {"n_kps": len(ds.dim_to_use),
                "n_actions": len(np.unique(ds.datadict["action"])),
                "dataset": ds, "norm_stats": ds.norm_stats,
                "seq_len": ds.seq_length[0],
                "action_offset": int(ds.datadict["action"].min())}
        return loader, meta

    raise ValueError(f"unsupported sequence dataset: {name}")
