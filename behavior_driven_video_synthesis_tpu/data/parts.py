"""In-plane part normalization: perspective-warp body parts to canonical
squares and stack them channel-wise (10 parts x 3ch = 30ch).

Behavioral port of the reference homography builders t2p/t3p/t4p/t5p
(/root/reference/lib/utils.py:70-232) and the part-stack assembly inside
`BaseDataset._get_app_img` (data/base_dataset.py:416-489).  Host-side
(cv2.getPerspectiveTransform/warpPerspective); a C++ batched variant lives in
native/ for the hot loader path.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, List

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _valid(pts) -> bool:
    return bool(np.all(np.asarray(pts) >= 0))


def t5p(kps, jm, wh, oh):
    """Body quadrangle from a 5-point body (neck intersection math,
    ref :70-132)."""
    part_kps = kps[np.asarray(jm.body), :2]
    neck = part_kps[2]
    ls_to_rs = part_kps[1] - part_kps[3]
    rh_to_rs = part_kps[1] - part_kps[0]
    lh_to_ls = part_kps[3] - part_kps[-1]
    rhip, lhip = part_kps[0], part_kps[-1]

    den_l = ls_to_rs[1] * lh_to_ls[0] - ls_to_rs[0] * lh_to_ls[1]
    den_r = ls_to_rs[1] * rh_to_rs[0] - ls_to_rs[0] * rh_to_rs[1]
    if abs(den_l) < 1e-8 or abs(den_r) < 1e-8:
        return None
    lambda_l = ((lhip[1] - neck[1]) * lh_to_ls[0]
                + (neck[0] - lhip[0]) * lh_to_ls[1]) / den_l
    lambda_r = ((rhip[1] - neck[1]) * rh_to_rs[0]
                + (neck[0] - rhip[0]) * rh_to_rs[1]) / den_r

    p1 = (neck + lambda_r * ls_to_rs).astype(np.float32)
    p2 = (neck + lambda_l * ls_to_rs).astype(np.float32)
    points_src = np.float32([p1, p2, lhip, rhip])
    points_dst = np.float32([[0, 0], [1, 0], [1, 1], [0, 1]]) * np.float32(wh)
    return cv2.getPerspectiveTransform(points_src, points_dst)


def t4p(kps, jm, wh, oh):
    """Body from a 4-point body (ref :135-146)."""
    points_src = np.float32(kps[np.asarray(jm.body)])
    points_dst = np.float32([[0, 0], [1, 0], [1, 1], [0, 1]]) * np.float32(wh)
    return cv2.getPerspectiveTransform(points_src, points_dst)


def t3p(kps, jm, wh, oh):
    """Head box from shoulders + headup, with shoulder-segment fallback
    (ref :149-188)."""
    head_pts = np.asarray([kps[jm.rshoulder], kps[jm.lshoulder],
                           kps[jm.headup]])
    if not _valid(head_pts):
        part_src = np.float32(kps[[jm.lshoulder, jm.rshoulder,
                                   jm.rshoulder]])
        if not _valid(part_src):
            return None
        segment = part_src[1] - part_src[0]
        normal = np.array([-segment[1], segment[0]])
        if normal[1] > 0.0:
            normal = -normal
        a = part_src[0] + normal
        b = part_src[0]
        c = part_src[1]
        d = part_src[1] + normal
    else:
        neck = 0.5 * (kps[jm.rshoulder] + kps[jm.lshoulder])
        neck_to_nose = kps[jm.headup] - neck
        part_src = np.float32([neck + 2 * neck_to_nose, neck])
        segment = part_src[1] - part_src[0]
        normal = np.array([-segment[1], segment[0]])
        alpha = 0.5
        a = part_src[0] + alpha * normal
        b = part_src[0] - alpha * normal
        c = part_src[1] - alpha * normal
        d = part_src[1] + alpha * normal
    points_src = np.float32([b, c, d, a])
    points_dst = np.float32([[0, 0], [0, 1], [1, 1], [1, 0]]) * np.float32(wh)
    return cv2.getPerspectiveTransform(points_src, points_dst)


def t2p(kps, ids, wh, oh, jm=None):
    """Limb box from two keypoints, with single-visible-point leg fallback
    (ref :191-232)."""
    pts = kps[np.asarray(ids)]
    if np.any(np.all(pts <= 0.0, axis=1)):
        nni = np.nonzero(np.all(pts > 0.0, axis=1))[0]
        if nni.size == 0:
            return None
        t_id = ids[int(nni[0])]
        a0 = kps[t_id]
        b0 = np.float32([a0[0], oh - 1])
        points_src = np.asarray([a0, b0], dtype=np.float32)
        segment = points_src[1] - points_src[0]
        normal = np.array([-segment[1], segment[0]])
        alpha = 0.25
        a = points_src[0] + alpha * normal
        b = points_src[0] - alpha * normal
        c = points_src[1] - alpha * normal
        d = points_src[1] + alpha * normal
        points_src = np.float32([a, b, c, d])
    else:
        segment = kps[ids[1]] - kps[ids[0]]
        normal = np.array([-segment[1], segment[0]])
        alpha = 0.25
        a = kps[ids[0]] + alpha * normal
        b = kps[ids[0]] - alpha * normal
        c = kps[ids[1]] - alpha * normal
        d = kps[ids[1]] + alpha * normal
        points_src = np.float32([a, b, c, d])
    points_dst = (np.float32([[0, 0], [0, 1], [1, 1], [1, 0]])
                  * np.float32(wh)) - 1.0
    return cv2.getPerspectiveTransform(points_src, points_dst)


def normalize_parts(img: np.ndarray, kps: np.ndarray, joint_model,
                    part_size: int) -> np.ndarray:
    """Warp each norm_T part to (part_size, part_size) and channel-concat.

    Returns (part_size, part_size, 3 * len(norm_T)) uint8.  Parts whose
    transform is undefined (invisible keypoints) come out black, matching the
    reference."""
    assert cv2 is not None
    oh = img.shape[0]
    wh = (part_size, part_size)
    mats, valid = [], []
    for t_fn in joint_model.norm_T:
        T = t_fn(kps, jm=joint_model, wh=wh, oh=oh)
        mats.append(np.eye(3) if T is None else T)
        valid.append(T is not None)

    from . import native
    if native.available() and img.dtype == np.uint8 and img.shape[-1] == 3:
        return native.assemble_part_stack(
            img, np.stack(mats), np.asarray(valid, np.uint8), part_size)

    stacks: List[np.ndarray] = []
    for T, ok in zip(mats, valid):
        if not ok:
            stacks.append(np.zeros((part_size, part_size, 3), img.dtype))
        else:
            stacks.append(cv2.warpPerspective(
                img, T, wh, borderMode=cv2.BORDER_REPLICATE))
    return np.concatenate(stacks, axis=-1)


def default_norm_T(jm) -> List[Callable]:
    """The 10-part layout used by the detailed H36M joint model
    (reference data/human36m.py:210-226): head, body, and 8 limb segments.

    Note: limb indices refer to the ORIGINAL (32-joint) keypoint layout —
    callers pass full-layout kps."""
    return [
        t3p,
        t5p,
        partial(t2p, ids=[25, 26]),
        partial(t2p, ids=[26, 30]),
        partial(t2p, ids=[17, 18]),
        partial(t2p, ids=[18, 22]),
        partial(t2p, ids=[1, 2]),
        partial(t2p, ids=[2, 3]),
        partial(t2p, ids=[6, 7]),
        partial(t2p, ids=[7, 8]),
    ]
