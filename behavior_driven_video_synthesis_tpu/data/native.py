"""ctypes bindings for the native data-pipeline kernels (native/).

Falls back gracefully (``available() == False``) when the shared library
hasn't been built; callers then use the cv2 paths.  Build with
``make -C native``.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libbdvs_native.so")


def _try_build() -> bool:
    """Attempt `make -C native` once if the source tree is present."""
    src_dir = os.path.dirname(_LIB_PATH)
    if not os.path.exists(os.path.join(src_dir, "Makefile")):
        return False
    import subprocess

    try:
        subprocess.run(["make", "-C", src_dir], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


_BUILD_ATTEMPTED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_ATTEMPTED
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        if _BUILD_ATTEMPTED:
            return None
        _BUILD_ATTEMPTED = True
        if not _try_build():
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    f32 = ctypes.POINTER(ctypes.c_float)
    f64 = ctypes.POINTER(ctypes.c_double)
    i32 = ctypes.POINTER(ctypes.c_int32)
    lib.warp_perspective_batch.argtypes = [
        u8, f64, u8] + [ctypes.c_int] * 7
    lib.render_stickman_batch.argtypes = [
        f32, ctypes.c_int, ctypes.c_int,
        i32, ctypes.c_int, i32, ctypes.c_int, i32, ctypes.c_int,
        i32, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, u8, ctypes.c_int]
    lib.assemble_part_stack.argtypes = [
        u8, ctypes.c_int, ctypes.c_int, f64, u8, ctypes.c_int,
        ctypes.c_int, u8]
    lib.assemble_part_stack_mt.argtypes = [
        u8, ctypes.c_int, ctypes.c_int, f64, u8, ctypes.c_int,
        ctypes.c_int, u8, ctypes.c_int]
    lib.bdvs_native_version.restype = ctypes.c_int
    if hasattr(lib, "decode_jpeg"):
        i64 = ctypes.POINTER(ctypes.c_int64)
        lib.decode_jpeg.argtypes = [
            u8, ctypes.c_longlong, ctypes.c_int, u8, ctypes.c_longlong,
            i32, i32]
        lib.decode_jpeg.restype = ctypes.c_int
        lib.decode_jpeg_batch.argtypes = [
            u8, i64, ctypes.c_int, ctypes.c_int, u8, ctypes.c_longlong,
            i32, i32, ctypes.c_int]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def warp_perspective_batch(imgs: np.ndarray, mats: np.ndarray,
                           out_size: int, n_threads: int = 8) -> np.ndarray:
    """imgs (N, H, W, C) uint8; mats (N, 3, 3) float64 forward homographies
    -> (N, out_size, out_size, C) uint8."""
    lib = _load()
    assert lib is not None
    imgs = np.ascontiguousarray(imgs, np.uint8)
    mats = np.ascontiguousarray(mats, np.float64)
    n, sh, sw, c = imgs.shape
    out = np.empty((n, out_size, out_size, c), np.uint8)
    lib.warp_perspective_batch(
        _ptr(imgs, ctypes.c_uint8), _ptr(mats, ctypes.c_double),
        _ptr(out, ctypes.c_uint8), n, sh, sw, c, out_size, out_size,
        n_threads)
    return out


def render_stickman_batch(joints: np.ndarray, joint_model, size: int,
                          thickness: int = 1,
                          n_threads: int = 8) -> np.ndarray:
    """joints (N, K, 2) float32 -> (N, S, S, 3) uint8 stickman rasters with
    the reference color scheme."""
    lib = _load()
    assert lib is not None
    joints = np.ascontiguousarray(joints, np.float32)
    n, k, _ = joints.shape
    right = np.ascontiguousarray(
        np.asarray(joint_model.right_lines, np.int32).reshape(-1, 2))
    left = np.ascontiguousarray(
        np.asarray(joint_model.left_lines, np.int32).reshape(-1, 2))
    head = np.ascontiguousarray(
        np.asarray(joint_model.head_lines, np.int32).reshape(-1, 2)
        if len(joint_model.head_lines) else np.zeros((0, 2), np.int32))
    body = np.ascontiguousarray(np.asarray(joint_model.body, np.int32))
    out = np.empty((n, size, size, 3), np.uint8)
    lib.render_stickman_batch(
        _ptr(joints, ctypes.c_float), n, k,
        _ptr(right, ctypes.c_int32), len(right),
        _ptr(left, ctypes.c_int32), len(left),
        _ptr(head, ctypes.c_int32), len(head),
        _ptr(body, ctypes.c_int32), len(body),
        int(joint_model.rshoulder), int(joint_model.lshoulder),
        int(joint_model.headup), size, thickness,
        _ptr(out, ctypes.c_uint8), n_threads)
    return out


def assemble_part_stack(img: np.ndarray, mats: np.ndarray,
                        valid: np.ndarray, part_size: int,
                        n_threads: int = 4) -> np.ndarray:
    """One image + n_parts homographies -> (part, part, 3*n_parts) uint8."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    mats = np.ascontiguousarray(mats, np.float64)
    valid = np.ascontiguousarray(valid, np.uint8)
    n_parts = mats.shape[0]
    out = np.empty((part_size, part_size, 3 * n_parts), np.uint8)
    lib.assemble_part_stack_mt(
        _ptr(img, ctypes.c_uint8), img.shape[0], img.shape[1],
        _ptr(mats, ctypes.c_double), _ptr(valid, ctypes.c_uint8),
        n_parts, part_size, _ptr(out, ctypes.c_uint8), n_threads)
    return out


def decode_available() -> bool:
    """True when the loaded library has the jpeg decode kernels (v2+)."""
    lib = _load()
    return lib is not None and hasattr(lib, "decode_jpeg")


def decode_jpeg(data: bytes, scale_denom: int = 1) -> np.ndarray:
    """Decode one jpeg byte stream -> (H, W, 3) uint8 RGB.

    scale_denom in {1, 2, 4, 8}: libjpeg-turbo DCT-domain downscale —
    output dims are ceil(dim/scale_denom) and the IDCT does proportionally
    less work.  The training loader only needs a bbox crop resized to
    256px out of a ~1000px frame, so decoding at 1/2 or 1/4 scale skips
    most of the decode cost (HOST_PIPELINE.json stage-1 bottleneck).
    """
    lib = _load()
    assert lib is not None and hasattr(lib, "decode_jpeg")
    assert scale_denom in (1, 2, 4, 8), scale_denom
    buf = np.frombuffer(data, np.uint8)
    # exact output dims from a header-only scan so the buffer is allocated
    # tight (libjpeg only reports output dims mid-decode)
    h, w = jpeg_dims(data)
    oh = -(-h // scale_denom)
    ow = -(-w // scale_denom)
    out = np.empty((oh, ow, 3), np.uint8)
    rh, rw = ctypes.c_int32(), ctypes.c_int32()
    rc = lib.decode_jpeg(
        _ptr(buf, ctypes.c_uint8), len(data), scale_denom,
        _ptr(out, ctypes.c_uint8), out.nbytes,
        ctypes.byref(rh), ctypes.byref(rw))
    if rc != 0:
        raise ValueError(f"native jpeg decode failed (rc={rc})")
    if (rh.value, rw.value) != (oh, ow):
        # ValueError (not assert) so BaseDataset._load_image_rgb's
        # fallback catches it and retries via cv2
        raise ValueError(
            f"native jpeg decode dims mismatch: kernel wrote "
            f"({rh.value}, {rw.value}), header scan predicted "
            f"({oh}, {ow})")
    return out


def jpeg_dims(data: bytes):
    """(height, width) from the SOFn marker — a few dozen bytes of header
    scan, no pixel work."""
    i = 2
    n = len(data)
    while i + 9 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:
            # legal fill byte before a marker (ITU T.81 B.1.1.2): the
            # NEXT byte is the marker, not a segment length
            i += 1
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return (int.from_bytes(data[i + 5:i + 7], "big"),
                    int.from_bytes(data[i + 7:i + 9], "big"))
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(data[i + 2:i + 4], "big")
        i += 2 + seg_len
    raise ValueError("no SOF marker found in jpeg stream")


def jpeg_orientation(data: bytes):
    """EXIF Orientation (tag 0x0112) from the APP1 segment: None when no
    EXIF segment exists, 0 when one exists but is malformed/unparseable
    (reads clamped to the segment), else the tag value.  cv2.imread
    auto-applies EXIF orientation; the native fast path must only be
    taken when there is provably nothing to apply (orientation in
    (None, 1)) — the 0 sentinel therefore routes to cv2."""
    i = 2
    n = len(data)
    while i + 4 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker == 0xDA:          # start of scan: no APP1 before pixels
            return None
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(data[i + 2:i + 4], "big")
        if marker == 0xE1 and data[i + 4:i + 10] == b"Exif\x00\x00":
            # every TIFF/IFD read below is clamped to the APP1 segment
            # [tiff, seg_end): a malformed IFD offset or inflated entry
            # count must not scan unrelated file bytes (a spurious
            # tag-0x0112 match there could wrongly green-light the native
            # fast path).  Out-of-bounds -> 0 sentinel (NOT None): the
            # segment is present but unparseable, so the caller skips the
            # fast path.
            tiff = i + 10
            # an APP1 whose claimed length overruns the file is malformed
            # (0 sentinel), never EXIF-absent via zero-length slices
            if i + 2 + seg_len > n:
                return 0
            seg_end = i + 2 + seg_len
            try:
                if data[tiff:tiff + 2] == b"II":
                    endian = "little"
                elif data[tiff:tiff + 2] == b"MM":
                    endian = "big"
                else:
                    return 0
                if tiff + 8 > seg_end:
                    return 0
                ifd = tiff + int.from_bytes(data[tiff + 4:tiff + 8],
                                            endian)
                if ifd < tiff or ifd + 2 > seg_end:
                    return 0
                n_entries = int.from_bytes(data[ifd:ifd + 2], endian)
                if ifd + 2 + 12 * n_entries > seg_end:
                    return 0
                for k in range(n_entries):
                    e = ifd + 2 + 12 * k
                    tag = int.from_bytes(data[e:e + 2], endian)
                    if tag == 0x0112:
                        return int.from_bytes(data[e + 8:e + 10], endian)
            except (IndexError, ValueError):
                return 0
            return None
        i += 2 + seg_len
    return None


def pick_scale_denom(h: int, w: int, min_dim: int) -> int:
    """Largest libjpeg DCT-downscale denominator in {1,2,4,8} that keeps
    BOTH output dims >= min_dim (so a later resize to min_dim stays a
    pure downscale).  Shared by the training loader
    (data/base.py:_load_image_rgb) and the host pipeline bench so both
    measure the same decode path."""
    denom = 1
    for d in (2, 4, 8):
        if -(-h // d) >= min_dim and -(-w // d) >= min_dim:
            denom = d
    return denom


def decode_jpeg_batch(streams, scale_denom: int = 1,
                      n_threads: int = 8):
    """Decode a list of jpeg byte streams -> list of (H, W, 3) uint8 RGB,
    threaded in C++ (the GIL is released for the whole batch)."""
    lib = _load()
    assert lib is not None and hasattr(lib, "decode_jpeg_batch")
    assert scale_denom in (1, 2, 4, 8), scale_denom
    n = len(streams)
    if n == 0:
        return []
    dims_full = [jpeg_dims(s) for s in streams]
    shapes = [(-(-h // scale_denom), -(-w // scale_denom))
              for h, w in dims_full]
    stride = max(h * w * 3 for h, w in shapes)
    data = np.frombuffer(b"".join(streams), np.uint8)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(s) for s in streams], out=offsets[1:])
    outs = np.empty((n, stride), np.uint8)
    dims = np.zeros((n, 2), np.int32)
    rcs = np.zeros(n, np.int32)
    lib.decode_jpeg_batch(
        _ptr(data, ctypes.c_uint8), _ptr(offsets, ctypes.c_int64), n,
        scale_denom, _ptr(outs, ctypes.c_uint8), stride,
        _ptr(dims, ctypes.c_int32), _ptr(rcs, ctypes.c_int32), n_threads)
    bad = np.nonzero(rcs)[0]
    if len(bad):
        raise ValueError(
            f"native jpeg batch decode failed for {len(bad)} stream(s), "
            f"first rc={rcs[bad[0]]} at index {bad[0]}")
    mismatch = [i for i in range(n)
                if (dims[i, 0], dims[i, 1]) != shapes[i]]
    if mismatch:
        i0 = mismatch[0]
        raise ValueError(
            f"native jpeg batch decode dims mismatch for "
            f"{len(mismatch)} stream(s); first at index {i0}: kernel "
            f"wrote {tuple(dims[i0])}, header scan predicted "
            f"{shapes[i0]}")
    return [outs[i, :shapes[i][0] * shapes[i][1] * 3]
            .reshape(shapes[i][0], shapes[i][1], 3) for i in range(n)]


def version() -> int:
    lib = _load()
    return lib.bdvs_native_version() if lib else -1
