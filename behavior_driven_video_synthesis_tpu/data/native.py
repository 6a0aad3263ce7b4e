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


def version() -> int:
    lib = _load()
    return lib.bdvs_native_version() if lib else -1
