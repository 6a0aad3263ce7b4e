"""Native C++ kernel tests: parity vs cv2 and throughput sanity."""
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from behavior_driven_video_synthesis_tpu.data import native
from behavior_driven_video_synthesis_tpu.data.human36m import (
    detailed_joint_model,
)
from behavior_driven_video_synthesis_tpu.geometry.stickman import (
    make_joint_img,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


class TestWarp:
    def test_vs_cv2(self, rng):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        src = np.float32([[5, 5], [60, 8], [58, 60], [4, 55]])
        dst = np.float32([[0, 0], [31, 0], [31, 31], [0, 31]])
        T = cv2.getPerspectiveTransform(src, dst).astype(np.float64)
        ref = cv2.warpPerspective(img, T, (32, 32),
                                  borderMode=cv2.BORDER_REPLICATE)
        ours = native.warp_perspective_batch(img[None], T[None], 32)[0]
        diff = np.abs(ref.astype(int) - ours.astype(int))
        # bilinear rounding differences only
        assert np.mean(diff) < 3.0, np.mean(diff)
        assert np.percentile(diff, 95) <= 16

    def test_batch_threads(self, rng):
        imgs = (rng.rand(16, 64, 64, 3) * 255).astype(np.uint8)
        T = np.tile(np.eye(3), (16, 1, 1))
        out = native.warp_perspective_batch(imgs, T, 64, n_threads=4)
        np.testing.assert_array_equal(out, imgs)  # identity warp


class TestStickman:
    def test_vs_cv2_iou(self, rng):
        jm = detailed_joint_model(world_coords=True)
        S = 64
        joints = (rng.rand(4, 17, 2) * (S * 0.8) + S * 0.1).astype(
            np.float32)
        ours = native.render_stickman_batch(joints, jm, S, thickness=3)
        for i in range(4):
            ref = make_joint_img((S, S, 3), joints[i], jm,
                                 scale_factor=S // 3)
            m1 = ours[i].sum(-1) > 0
            m2 = ref.sum(-1) > 0
            iou = (m1 & m2).sum() / max((m1 | m2).sum(), 1)
            assert iou > 0.6, f"sample {i}: IoU {iou:.3f}"

    def test_invalid_joints_skipped(self):
        jm = detailed_joint_model(world_coords=True)
        joints = np.full((1, 17, 2), -1.0, np.float32)
        out = native.render_stickman_batch(joints, jm, 32)
        assert out.sum() == 0


class TestPartStack:
    def test_assemble(self, rng):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        mats = np.tile(np.eye(3), (10, 1, 1))
        valid = np.ones(10, np.uint8)
        valid[3] = 0
        out = native.assemble_part_stack(img, mats, valid, 16)
        assert out.shape == (16, 16, 30)
        assert out[..., 9:12].sum() == 0  # invalid part zeroed

    def test_throughput_vs_python_loop(self, rng):
        """The native kernel's win is the fused per-sample part stack (one
        C call for 10 warps + concat) vs the python loop with 10 cv2
        crossings per sample (the reference's hot path).  Raw single warps
        are cv2's SIMD home turf — that's not what we replace."""
        n_samples, n_parts, S, P = 32, 10, 256, 64
        imgs = (rng.rand(n_samples, S, S, 3) * 255).astype(np.uint8)
        src = np.float32([[5, 5], [200, 8], [198, 200], [4, 195]])
        dst = np.float32([[0, 0], [P - 1, 0], [P - 1, P - 1], [0, P - 1]])
        T = cv2.getPerspectiveTransform(src, dst).astype(np.float64)
        mats = np.tile(T, (n_parts, 1, 1))
        valid = np.ones(n_parts, np.uint8)

        t0 = time.perf_counter()
        for i in range(n_samples):
            parts = [cv2.warpPerspective(imgs[i], T, (P, P),
                                         borderMode=cv2.BORDER_REPLICATE)
                     for _ in range(n_parts)]
            np.concatenate(parts, axis=-1)
        t_py = time.perf_counter() - t0

        native.assemble_part_stack(imgs[0], mats, valid, P)  # warm
        # best-of-3 on both sides: this box has ONE cpu and other jobs can
        # steal the core mid-measurement; a single timing is too flaky
        t_nat = min(self._time_native(native, imgs, mats, valid, P)
                    for _ in range(3))
        t_py = min(t_py, *(self._time_python(imgs, T, P, n_parts)
                           for _ in range(2)))
        # must be in the same ballpark or better (generous CI margin)
        assert t_nat < t_py * 3.0, (t_nat, t_py)

    @staticmethod
    def _time_native(native, imgs, mats, valid, P):
        t0 = time.perf_counter()
        for i in range(imgs.shape[0]):
            native.assemble_part_stack(imgs[i], mats, valid, P)
        return time.perf_counter() - t0

    @staticmethod
    def _time_python(imgs, T, P, n_parts):
        t0 = time.perf_counter()
        for i in range(imgs.shape[0]):
            parts = [cv2.warpPerspective(imgs[i], T, (P, P),
                                         borderMode=cv2.BORDER_REPLICATE)
                     for _ in range(n_parts)]
            np.concatenate(parts, axis=-1)
        return time.perf_counter() - t0
