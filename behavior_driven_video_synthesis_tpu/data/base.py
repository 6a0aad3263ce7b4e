"""Column-store sequence dataset: windowing, pairing, fetchers.

Re-design of /root/reference/data/base_dataset.py (814 LoC): the dataset is a
dict of parallel numpy arrays (``datadict``) with per-key fetchers resolved
through ``_output_dict``.  Behavior preserved:

  * ``__getitem__`` accepts ``idx`` or ``[idx, seq_len]`` (the sampler passes
    the per-batch sequence length, ref samplers.py:241-280);
  * `_sample_valid_seq_ids` windows from an anchor with ``sequential_frame_
    lag``, clamping at video boundaries with lag reduction (ref :556-596);
  * per-epoch `resample_map_ids`: label-transfer pairs drawn from *different*
    actions, matched pairs within the same action (ref :727-759);
  * lag/length auto-correction against the shortest video (ref :613-653);
  * 80/20 overall split with the fixed seed 42 (ref :775-806).

Pixel fetchers (images, stickman, part crops) call `_load_image`, overridden
by file-backed datasets (cv2.imread) and by the synthetic in-memory test
dataset.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

from ..geometry.stickman import JointModel, make_joint_img
from .parts import normalize_parts

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class BaseDataset:
    def __init__(self, transforms, mode: str, seq_length, datakeys,
                 joint_model: JointModel, **kwargs):
        assert mode in ["train", "test"]
        self.mode = mode
        self.transforms = transforms
        self.datakeys = list(datakeys)
        self.joint_model = joint_model
        self.seq_length = tuple(seq_length)

        self.spatial_size = int(kwargs.get("spatial_size", 256))
        self.box_factor = int(kwargs.get("box_factor", 2))
        self.sequential_frame_lag = int(kwargs.get("sequential_frame_lag", 1))
        self.use_crops = bool(kwargs.get("use_crops", False))
        self.crop_app = bool(kwargs.get("crop_app", False))
        self.inplane_normalize = bool(kwargs.get("inplane_normalize", False))
        self.label_transfer = bool(kwargs.get("label_transfer", False))
        self.train_reg = bool(kwargs.get("train_regressor", False))
        self.rng = np.random.RandomState(kwargs.get("data_seed", None))
        # distinct per-limb stickman line colors (reference
        # base_dataset.py:149-162 `diff_line_colors`)
        if kwargs.get("diff_line_colors", False):
            from ..geometry.stickman import get_line_colors
            self.line_colors = get_line_colors(
                (len(joint_model.left_lines), len(joint_model.right_lines),
                 len(joint_model.head_lines) + len(joint_model.face)))
        else:
            self.line_colors = None

        self.datadict: Dict[str, np.ndarray] = {
            "img_paths": np.asarray([]),
            "keypoints": np.asarray([]),
            "v_ids": np.asarray([], np.int64),
            "p_ids": np.asarray([], np.int64),
            "f_ids": np.asarray([], np.int64),
            "map_ids": np.asarray([], np.int64),
            "action": np.asarray([], np.int64),
        }
        self.complete_datadict: Optional[Dict[str, np.ndarray]] = None
        self.matched_map_ids: Optional[np.ndarray] = None
        self.pose_encodings: Optional[np.ndarray] = None
        self.sequence_start_ids: Dict[int, int] = {}
        self.sequence_end_ids: Dict[int, int] = {}

        self._output_dict: Dict[str, Callable] = {
            "keypoints": self._get_keypoints,
            "paired_keypoints": lambda ids: self._get_paired(
                self._get_keypoints, ids),
            "matched_keypoints": lambda ids: self._get_paired(
                self._get_keypoints, ids, matched=True),
            "stickman": self._get_stickman,
            "paired_stickman": lambda ids: self._get_paired(
                self._get_stickman, ids),
            "pose_img": self._get_pose_img,
            "app_img": self._get_app_img,
            "pose_img_inplane": self._get_pose_img_inplane,
            "sample_ids": lambda ids: np.asarray(ids, np.int64),
            "paired_sample_ids": lambda ids: np.asarray(
                self.datadict["map_ids"][np.asarray(ids)], np.int64),
            "action": lambda ids: self.datadict["action"][
                np.asarray(ids)].astype(np.int64),
            "img_size": lambda ids: np.asarray(
                [self.spatial_size, self.spatial_size]),
            "synth_weights": self._get_synth_weights,
        }
        self.reg_steps = int(kwargs.get("reg_steps", 5))

    # -- population hooks (called by subclasses after filling datadict) ----
    def _finalize(self):
        self.datadict = {k: np.asarray(v) for k, v in self.datadict.items()
                         if np.asarray(v).size != 0}
        self._get_sequence_start_ids()
        self._get_sequence_end_ids()
        if self.seq_length[1] > 0:
            self._check_seq_len_and_frame_lag()
        if "map_ids" not in self.datadict or \
                self.datadict["map_ids"].size != len(self):
            self.datadict["map_ids"] = np.arange(len(self))
        self.resample_map_ids()

    def __len__(self) -> int:
        key = "img_paths" if "img_paths" in self.datadict else "keypoints"
        return int(self.datadict[key].shape[0])

    # -- windowing ----------------------------------------------------------
    def _sample_valid_seq_ids(self, input_data):
        if self.seq_length[0] == 0 and self.seq_length[1] == 0:
            idx = input_data if isinstance(input_data, (int, np.integer)) \
                else input_data[0]
            return np.asarray([idx])

        if isinstance(input_data, (int, np.integer)):
            idx = int(input_data)
            seq_len = int(self.rng.randint(self.seq_length[0],
                                           self.seq_length[1] + 1))
        else:
            idx = int(input_data[0])
            seq_len = int(input_data[-1])

        v_id = int(self.datadict["v_ids"][idx])
        seq_end_id = self.sequence_end_ids[v_id]
        frame_lag = self.sequential_frame_lag
        idx_start = idx
        idx_end = idx_start + frame_lag * seq_len + 1  # anchor + seq_len

        if idx_end > seq_end_id:
            seq_start_id = self.sequence_start_ids[v_id]
            idx_start = idx_start - (idx_end - seq_end_id) + 1
            idx_end = seq_end_id + 1
            if idx_start < seq_start_id:
                frame_lag = max(1, int((idx_end - seq_start_id) / seq_len))
                idx_start = idx_end - frame_lag * seq_len - 1

        return np.arange(idx_start, idx_end, frame_lag)

    def _get_sequence_end_ids(self):
        v = self.datadict["v_ids"]
        self.sequence_end_ids = {int(k): int(np.max(np.where(v == k)[0]))
                                 for k in np.unique(v)}

    def _get_sequence_start_ids(self):
        v = self.datadict["v_ids"]
        self.sequence_start_ids = {int(k): int(np.min(np.where(v == k)[0]))
                                   for k in np.unique(v)}

    def _check_seq_len_and_frame_lag(self):
        seq_lengths = [self.sequence_end_ids[v] - self.sequence_start_ids[v]
                       for v in self.sequence_end_ids]
        min_seq_len = int(np.min(seq_lengths))
        if self.seq_length[1] * self.sequential_frame_lag > min_seq_len:
            self.sequential_frame_lag = max(
                1, int(min_seq_len / self.seq_length[1]))
            if self.seq_length[1] > min_seq_len:
                self.seq_length = (self.seq_length[0], min_seq_len)
                if self.seq_length[0] >= self.seq_length[1]:
                    self.seq_length = (self.seq_length[1] - 1,
                                       self.seq_length[1])

    # -- pairing ------------------------------------------------------------
    def resample_map_ids(self):
        self.__resample_map(self.datadict, use_matched=True)
        if self.complete_datadict is not None:
            self.__resample_map(self.complete_datadict)

    def __resample_map(self, ddict, use_matched: bool = False):
        if ddict["action"].size == 0:
            return
        if "map_ids" not in ddict or ddict["map_ids"].size != \
                ddict["action"].size:
            ddict["map_ids"] = np.arange(ddict["action"].size)
        unique_aids = np.unique(ddict["action"])
        if self.label_transfer:
            for aid in unique_aids:
                same = np.nonzero(ddict["action"] == aid)[0]
                diff = np.nonzero(ddict["action"] != aid)[0]
                if diff.size == 0:
                    continue
                replace = same.size > diff.size
                ddict["map_ids"][same] = self.rng.choice(
                    diff, same.size, replace=replace)
                if self.matched_map_ids is not None and use_matched:
                    shuffled = same.copy()
                    self.rng.shuffle(shuffled)
                    self.matched_map_ids[same] = shuffled
        else:
            for aid in unique_aids:
                valid = np.nonzero(ddict["action"] == aid)[0]
                shuffled = valid.copy()
                self.rng.shuffle(shuffled)
                ddict["map_ids"][valid] = shuffled

    def _make_overall_split(self):
        """80/20 random split at fixed seed 42 (ref :775-806).

        Dedicated RandomState: the split must be identical across processes
        and independent of data_seed, and the global numpy RNG stays
        untouched (explicit-RNG rule)."""
        n = len(self)
        rng = np.random.RandomState(42)
        ids = rng.permutation(n)
        target = ids[:int(0.8 * n)]
        self.datadict = {k: v[target] for k, v in self.datadict.items()
                         if v.size != 0}

    # -- item assembly -------------------------------------------------------
    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        ids = self._sample_valid_seq_ids(idx)
        data = {key: self._output_dict[key](ids) for key in self.datakeys
                if key not in ("reg_imgs", "reg_targets")}
        if self.train_reg or "reg_imgs" in self.datakeys:
            self._add_reg_imgs(ids, data)
        return data

    def _add_reg_imgs(self, ids, data):
        """Regressor probe images + matching keypoint targets: the current
        window's ids plus reg_steps-1 random extra samples (ref :256-279)."""
        ids = list(np.asarray(ids))
        if self.reg_steps > 1:
            extra = list(self.rng.choice(len(self), self.reg_steps - 1,
                                         replace=False))
            reg_ids = [int(ids[0])] + [int(e) for e in extra]
        else:
            reg_ids = [int(ids[0])]
        fetch = (self._get_pose_img_inplane if self.inplane_normalize
                 else self._get_pose_img)
        imgs = fetch(np.asarray(reg_ids))
        if imgs.ndim == 3:
            imgs = imgs[None]
        data["reg_imgs"] = imgs
        data["reg_targets"] = np.stack(
            [self._get_kps_for_rendering(i) / self.spatial_size
             for i in reg_ids]).astype(np.float32)
        return data

    # -- fetchers ------------------------------------------------------------
    def _get_paired(self, fetch, ids, matched: bool = False):
        ids = np.asarray(ids)
        if matched and getattr(self, "pose_encodings", None) is not None:
            return fetch(self._match_subsequence(ids))
        table = (self.matched_map_ids if matched and
                 self.matched_map_ids is not None
                 else self.datadict["map_ids"])
        anchor = int(table[ids[0]])
        new_ids = self._sample_valid_seq_ids([anchor, len(ids) - 1])
        return fetch(new_ids)

    # -- pose-encoding sequence matching (ref base_dataset.py:365-414) -------
    def set_pose_encodings(self, encodings: np.ndarray):
        """Attach per-frame pose embeddings enabling NN sequence matching
        for matched_keypoints (the reference sets `pose_encodings`
        externally and builds `seqs_per_action`)."""
        assert len(encodings) == len(self)
        self.pose_encodings = np.asarray(encodings, np.float32)
        self._build_seqs_per_action()

    def _build_seqs_per_action(self):
        self.seqs_per_action = {}
        v = self.datadict["v_ids"]
        for vid in np.unique(v):
            idx = np.where(v == vid)[0]
            aid = int(self.datadict["action"][idx[0]])
            self.seqs_per_action.setdefault(aid, []).append(idx)

    def get_action_sequence(self, action_label: int) -> np.ndarray:
        seqs = self.seqs_per_action[int(action_label)]
        return seqs[int(self.rng.randint(len(seqs)))]

    def _match_subsequence(self, ids: np.ndarray) -> np.ndarray:
        """NN subsequence of a random same-action video under the pose
        embeddings (window stride 5, mean L2 — ref :365-414)."""
        action_id = int(self.datadict["action"][ids[0]])
        ids_target = np.asarray(self.get_action_sequence(action_id))
        base = self.pose_encodings[ids]
        target = self.pose_encodings[ids_target]
        L1 = len(ids)
        lag = self.sequential_frame_lag
        span = lag * L1
        if len(ids_target) < span:
            # target too short: fall back to matched map ids
            anchor = int((self.matched_map_ids
                          if self.matched_map_ids is not None
                          else self.datadict["map_ids"])[ids[0]])
            return self._sample_valid_seq_ids([anchor, L1 - 1])
        starts = np.arange(0, len(ids_target) - span + 1, 5)
        best, best_k = np.inf, 0
        for k in starts:
            win = target[k:k + span:lag]
            d = float(np.mean(np.linalg.norm(win - base, axis=-1)))
            if d < best:
                best, best_k = d, k
        return ids_target[best_k:best_k + span:lag]

    def _get_keypoints(self, ids):
        return self.datadict["keypoints"][np.asarray(ids)].astype(np.float32)

    def _get_kps_for_rendering(self, idx: int) -> np.ndarray:
        """2D pixel keypoints for one frame (subclass hook)."""
        kps = self.datadict["keypoints"][idx]
        return kps.reshape(-1, 2)

    def _get_stickman(self, ids):
        size = (self.spatial_size, self.spatial_size, 3)
        out = []
        for i in np.asarray(ids):
            kps = self._get_kps_for_rendering(int(i))
            img = make_joint_img(size, kps, self.joint_model,
                                 line_colors=self.line_colors,
                                 scale_factor=self.stickman_scale_factor())
            out.append(self._to_float(img))
        return self._squeeze_seq(np.stack(out))

    def stickman_scale_factor(self):
        return None

    def _get_synth_weights(self, ids, weight: float = 10.0):
        """Per-pixel loss-weight maps: ``weight`` inside the keypoint hull
        region, 1 elsewhere (reference _get_synth_weights,
        base_dataset.py:655-683)."""
        out = []
        S = self.spatial_size
        for i in np.asarray(ids):
            kps = self._get_kps_for_rendering(int(i))
            valid = kps[np.all(kps >= 0, axis=1)]
            wmap = np.ones((S, S, 1), np.float32)
            if len(valid) >= 3 and cv2 is not None:
                hull = cv2.convexHull(valid.astype(np.int32))
                mask = np.zeros((S, S), np.uint8)
                cv2.fillConvexPoly(mask, hull, 1)
                wmap[mask > 0] = weight
            out.append(wmap)
        return self._squeeze_seq(np.stack(out))

    def _load_image(self, idx: int) -> np.ndarray:
        """uint8 HWC BGR image for sample idx (file-backed default)."""
        assert cv2 is not None
        img = cv2.imread(str(self.datadict["img_paths"][idx]))
        if img is None:
            raise FileNotFoundError(self.datadict["img_paths"][idx])
        return img

    def _load_image_rgb(self, idx: int, min_dim=None) -> np.ndarray:
        """uint8 HWC RGB image for sample idx.

        Fast path: jpeg files decode through the native libjpeg kernel
        (native/bdvs_native.cpp decode_jpeg; bit-exact vs cv2.imread at
        full scale).  With a ``min_dim`` hint the decode uses libjpeg's
        DCT-domain downscaling at the largest power-of-two denominator
        that still leaves both output dims >= min_dim, so the later
        resize to ``spatial_size`` remains a pure downscale while the
        IDCT does up to 1/64 of the pixel work — the single-thread decode
        bottleneck measured in HOST_PIPELINE.json.
        """
        from . import native
        p = str(self.datadict["img_paths"][idx])
        if native.decode_available() and p.lower().endswith(
                (".jpg", ".jpeg")):
            try:
                with open(p, "rb") as f:
                    data = f.read()
                # cv2.imread auto-applies EXIF orientation; the native
                # kernel does not — only fast-path files with nothing
                # to apply so both paths return the same pixels
                if native.jpeg_orientation(data) in (None, 1):
                    denom = 1
                    if min_dim:
                        h, w = native.jpeg_dims(data)
                        denom = native.pick_scale_denom(h, w, min_dim)
                    return native.decode_jpeg(data, denom)
            except (ValueError, OSError):
                pass  # corrupt/unsupported stream: fall through to cv2
        img = self._load_image(idx)
        if img.ndim == 3 and img.shape[-1] == 3 and cv2 is not None:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)  # ref :313-314
        return img

    def _prep_image(self, idx: int) -> np.ndarray:
        img = self._load_image_rgb(idx, min_dim=self.spatial_size)
        if (img.shape[0] != self.spatial_size
                or img.shape[1] != self.spatial_size):
            img = cv2.resize(img, (self.spatial_size, self.spatial_size),
                             interpolation=cv2.INTER_LINEAR)
        return img

    def _to_float(self, img: np.ndarray) -> np.ndarray:
        """uint8 [0,255] -> float32 [-1,1], HWC (RGB — the reference converts
        BGR->RGB before its transforms)."""
        return (img.astype(np.float32) / 127.5) - 1.0

    def _squeeze_seq(self, arr: np.ndarray) -> np.ndarray:
        """Single-frame datasets (seq_length=(0,0)) return the frame, not a
        length-1 sequence, matching the reference transforms."""
        if self.seq_length == (0, 0) and arr.shape[0] == 1:
            return arr[0]
        return arr

    def _get_pose_img(self, ids):
        out = []
        for i in np.asarray(ids):
            img = self._prep_image(int(i))
            if self.use_crops:
                from ..utils.boxes import crop_with_bbox
                img = crop_with_bbox(img, self._get_kps_for_rendering(int(i)))
                img = cv2.resize(img, (self.spatial_size, self.spatial_size),
                                 interpolation=cv2.INTER_LINEAR)
            out.append(self._to_float(img))
        return self._squeeze_seq(np.stack(out))

    def _get_app_img(self, ids):
        ids = np.asarray(ids)
        mapped = self.datadict["map_ids"][ids]
        out = []
        for i in mapped:
            img = self._prep_image(int(i))
            if self.inplane_normalize:
                img = normalize_parts(
                    img, self._get_kps_for_rendering(int(i)),
                    self.joint_model,
                    self.spatial_size // 2 ** self.box_factor)
                out.append((img.astype(np.float32) / 127.5) - 1.0)
            else:
                out.append(self._to_float(img))
        return self._squeeze_seq(np.stack(out))

    def _get_pose_img_inplane(self, ids):
        out = []
        for i in np.asarray(ids):
            img = self._prep_image(int(i))
            if self.inplane_normalize:
                img = normalize_parts(
                    img, self._get_kps_for_rendering(int(i)),
                    self.joint_model,
                    self.spatial_size // 2 ** self.box_factor)
                out.append((img.astype(np.float32) / 127.5) - 1.0)
            else:
                out.append(self._to_float(img))
        return self._squeeze_seq(np.stack(out))


