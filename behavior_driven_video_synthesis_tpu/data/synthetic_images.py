"""Synthetic image dataset for the VUNet experiments (tests/demo).

Generates consistent (appearance, pose) pairs without any real data: each
"person" has a fixed color palette; frames render the person's limbs as
colored capsules at 2D keypoint positions on a textured background; the
stickman is the standard skeleton raster of the same keypoints.  Appearance
transfer is well-posed: map_ids pick a different frame of the same person.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from ..geometry.stickman import make_joint_img
from .deepfashion import deepfashion_joint_model

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class SyntheticImageDataset:
    def __init__(self, n_persons: int = 8, frames_per_person: int = 16,
                 spatial_size: int = 64, seed: int = 0,
                 with_reg: bool = False, reg_steps: int = 2,
                 inplane_normalize: bool = False, box_factor: int = 2):
        self.spatial_size = spatial_size
        self.with_reg = with_reg
        self.reg_steps = reg_steps
        self.inplane_normalize = inplane_normalize
        self.box_factor = box_factor
        self.joint_model = deepfashion_joint_model()
        rng = np.random.RandomState(seed)
        self.rng = rng

        n = n_persons * frames_per_person
        self.p_ids = np.repeat(np.arange(n_persons), frames_per_person)
        self.palettes = rng.randint(60, 255, (n_persons, 4, 3))

        # smooth per-person keypoint trajectories in [0.15, 0.85]
        base = rng.uniform(0.25, 0.75, (n_persons, 18, 2))
        amp = rng.uniform(0.02, 0.08, (n_persons, 18, 2))
        phase = rng.uniform(0, 2 * np.pi, (n_persons, 18, 2))
        t = np.arange(frames_per_person)[:, None, None] / frames_per_person
        kps = (base[:, None] + amp[:, None]
               * np.sin(2 * np.pi * t[None] + phase[:, None]))
        self.norm_keypoints = kps.reshape(n, 18, 2).clip(0.05, 0.95)

        self.map_ids = np.empty(n, np.int64)
        for p in range(n_persons):
            idx = np.where(self.p_ids == p)[0]
            self.map_ids[idx] = rng.permutation(idx)

        self.person_ids = list(range(n_persons))
        self.n = n

    def __len__(self):
        return self.n

    def _render_person(self, idx: int) -> np.ndarray:
        """RGB uint8 'photo' of the person at frame idx."""
        S = self.spatial_size
        pal = self.palettes[self.p_ids[idx]]
        kps = self.norm_keypoints[idx] * S
        img = np.full((S, S, 3),
                      60 + 10 * (self.p_ids[idx] % 4), np.uint8)
        jm = self.joint_model
        groups = [jm.right_lines, jm.left_lines, jm.face]
        for gi, lines in enumerate(groups):
            color = tuple(int(c) for c in pal[gi])
            for a, b in lines:
                cv2.line(img, tuple(kps[a].astype(int)),
                         tuple(kps[b].astype(int)), color,
                         thickness=max(2, S // 24))
        body = kps[np.asarray(jm.body)].astype(np.int32)
        cv2.fillPoly(img, [body], tuple(int(c) for c in pal[3]))
        return img

    def _stickman(self, idx: int) -> np.ndarray:
        S = self.spatial_size
        kps = self.norm_keypoints[idx] * S
        return make_joint_img((S, S, 3), kps, self.joint_model,
                              scale_factor=24)

    def _to_float(self, img):
        return (img.astype(np.float32) / 127.5) - 1.0

    def _app(self, idx: int) -> np.ndarray:
        """Appearance: plain render, or the 30-channel in-plane part stack
        (normalize_parts over the DeepFashion norm_T) when enabled."""
        img = self._render_person(idx)
        if not self.inplane_normalize:
            return self._to_float(img)
        from .parts import normalize_parts

        kps = self.norm_keypoints[idx] * self.spatial_size
        part = self.spatial_size // 2 ** self.box_factor
        stack = normalize_parts(img, kps, self.joint_model, part)
        return (stack.astype(np.float32) / 127.5) - 1.0

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        item = {
            "pose_img": self._to_float(self._render_person(idx)),
            "stickman": self._to_float(self._stickman(idx)),
            "app_img": self._app(int(self.map_ids[idx])),
            "sample_ids": np.int64(idx),
            "p_ids": np.int64(self.p_ids[idx]),
        }
        if self.with_reg:
            picks = [idx] + list(
                self.rng.choice(self.n, self.reg_steps - 1, replace=False))
            item["reg_imgs"] = np.stack(
                [self._to_float(self._render_person(int(i)))
                 for i in picks])
            item["reg_targets"] = np.stack(
                [self.norm_keypoints[int(i)] for i in picks]
            ).astype(np.float32)
        return item

    def batches(self, batch_size: int, seed: int = 0,
                n_batches: Optional[int] = None
                ) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(seed)
        order = rng.permutation(self.n)
        count = 0
        for s in range(0, self.n - batch_size + 1, batch_size):
            idx = order[s:s + batch_size]
            items = [self[int(i)] for i in idx]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
            count += 1
            if n_batches is not None and count >= n_batches:
                return
