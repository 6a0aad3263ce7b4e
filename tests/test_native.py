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


class TestJpegDecode:
    """decode_jpeg[_batch]: libjpeg decode with DCT-domain downscaling
    (native/bdvs_native.cpp v2) — the loader's stage-1 bottleneck fix."""

    @pytest.fixture(autouse=True)
    def _need_decode(self):
        if not native.decode_available():
            pytest.skip("library built without jpeg decode (v1)")

    def _jpeg(self, rng, h=240, w=320, q=92, smooth=False):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        if smooth:
            # natural-image-like content: white noise is the worst case
            # for comparing two different low-pass downscales
            img = cv2.GaussianBlur(img, (0, 0), 3)
        ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
        assert ok
        return enc.tobytes()

    def test_full_scale_bit_exact_vs_cv2(self, rng):
        data = self._jpeg(rng)
        ours = native.decode_jpeg(data, 1)
        ref = cv2.imdecode(np.frombuffer(data, np.uint8),
                           cv2.IMREAD_COLOR)[:, :, ::-1]  # BGR -> RGB
        np.testing.assert_array_equal(ours, ref)

    def test_dims_header_scan(self, rng):
        data = self._jpeg(rng, h=123, w=457)
        assert native.jpeg_dims(data) == (123, 457)

    def test_dims_with_fill_bytes(self, rng):
        """ITU T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
        marker; the header scan must skip them, not read the marker as a
        segment length (found live by the round-4 self-review)."""
        data = self._jpeg(rng, h=123, w=457)
        # inject a fill byte before the first post-SOI marker
        assert data[:2] == b"\xff\xd8"
        padded = data[:2] + b"\xff" + data[2:]
        assert native.jpeg_dims(padded) == (123, 457)

    def test_orientation_parse(self, rng):
        data = self._jpeg(rng)
        # cv2-encoded jpegs carry no EXIF -> None (fast path eligible)
        assert native.jpeg_orientation(data) is None
        # splice in a minimal APP1 Exif segment with Orientation=6
        tiff = (b"II*\x00\x08\x00\x00\x00"          # TIFF header, IFD @8
                b"\x01\x00"                          # 1 entry
                b"\x12\x01\x03\x00\x01\x00\x00\x00"  # tag 0x0112 SHORT x1
                b"\x06\x00\x00\x00"                  # value 6
                b"\x00\x00\x00\x00")                 # next-IFD offset
        payload = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
        tagged = data[:2] + app1 + data[2:]
        assert native.jpeg_orientation(tagged) == 6
        assert native.jpeg_dims(tagged) == (240, 320)

    def test_orientation_malformed_exif_is_sentinel(self, rng):
        """A present-but-malformed APP1 must return the 0 sentinel (skip
        the native fast path), never scan beyond the segment: a garbage
        IFD offset could otherwise hit a spurious 0x0112 pattern in
        unrelated file bytes and read as orientation=1 (fast-path
        eligible) on a file cv2 might rotate differently."""
        data = self._jpeg(rng)

        def with_app1(tiff):
            payload = b"Exif\x00\x00" + tiff
            app1 = (b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big")
                    + payload)
            return data[:2] + app1 + data[2:]

        # IFD offset pointing far past the APP1 segment
        far = with_app1(b"II*\x00" + (10 ** 6).to_bytes(4, "little"))
        assert native.jpeg_orientation(far) == 0
        # entry count larger than the segment can hold
        fat = with_app1(b"II*\x00\x08\x00\x00\x00" + b"\xff\x7f")
        assert native.jpeg_orientation(fat) == 0
        # truncated TIFF header (no IFD offset at all)
        short = with_app1(b"II*\x00")
        assert native.jpeg_orientation(short) == 0
        # unknown byte order
        bad = with_app1(b"XX*\x00\x08\x00\x00\x00\x00\x00")
        assert native.jpeg_orientation(bad) == 0

    def test_pick_scale_denom(self):
        assert native.pick_scale_denom(1000, 1000, 256) == 2
        assert native.pick_scale_denom(1000, 1000, 125) == 8
        assert native.pick_scale_denom(1000, 300, 256) == 1
        assert native.pick_scale_denom(2048, 2048, 256) == 8

    def test_dct_downscale_dims_and_content(self, rng):
        data = self._jpeg(rng, h=250, w=330, smooth=True)
        for d in (2, 4, 8):
            out = native.decode_jpeg(data, d)
            assert out.shape == (-(-250 // d), -(-330 // d), 3), out.shape
        # half-scale decode ~ full decode + area resize (DCT downscale is
        # a clean low-pass; allow jpeg rounding slack)
        half = native.decode_jpeg(data, 2).astype(np.float32)
        full = cv2.resize(native.decode_jpeg(data, 1), (165, 125),
                          interpolation=cv2.INTER_AREA).astype(np.float32)
        assert np.abs(half - full).mean() < 8.0

    def test_batch_matches_single_and_mixed_sizes(self, rng):
        streams = [self._jpeg(rng, h=100 + 17 * i, w=90 + 31 * i)
                   for i in range(5)]
        outs = native.decode_jpeg_batch(streams, scale_denom=2, n_threads=3)
        for s, o in zip(streams, outs):
            np.testing.assert_array_equal(o, native.decode_jpeg(s, 2))

    def test_corrupt_stream_raises(self, rng):
        data = self._jpeg(rng)
        with pytest.raises(ValueError):
            native.decode_jpeg(data[:40], 1)  # truncated before SOF
        # NOTE: truncation mid-scan is a libjpeg WARNING, not an error —
        # the decoder fills the remaining MCUs (same as cv2.imdecode);
        # only header-level corruption raises.
        out = native.decode_jpeg(data[:len(data) // 2], 1)
        assert out.shape == (240, 320, 3)

    def test_loader_uses_native_path(self, rng, tmp_path):
        """BaseDataset._load_image_rgb: jpeg on disk -> native decode at
        the largest DCT denom keeping dims >= spatial_size; numerics stay
        close to the cv2 full-decode path after the resize."""
        from behavior_driven_video_synthesis_tpu.data.base import (
            BaseDataset,
        )
        img = cv2.GaussianBlur(
            (rng.rand(512, 512, 3) * 255).astype(np.uint8), (0, 0), 3)
        p = tmp_path / "f.jpg"
        cv2.imwrite(str(p), img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        ds = BaseDataset.__new__(BaseDataset)
        ds.datadict = {"img_paths": np.array([str(p)])}
        ds.spatial_size = 128
        out = ds._load_image_rgb(0, min_dim=128)
        # 512 / 4 = 128 >= 128 -> denom 4
        assert out.shape == (128, 128, 3), out.shape
        full = cv2.resize(
            cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB),
            (128, 128), interpolation=cv2.INTER_LINEAR)
        assert np.abs(out.astype(np.float32)
                      - full.astype(np.float32)).mean() < 8.0
        prepped = ds._prep_image(0)
        assert prepped.shape == (128, 128, 3)
