"""Host-side video/figure generation.

Equivalents of the reference's visualization stack (lib/logging.py:
create_video_3d :1205-1275, make_eval_grid :1548-1867, make_enrollment
:2680-2886; lib/utils.py: make_img_grid, save_tensor_as_img; data/
data_conversions_3d.py: Ax3DPose :915-1044).  All host-side and unjitted —
mp4 writing via cv2.VideoWriter, 3D skeletons via matplotlib Agg.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def frames_to_uint8(frames: np.ndarray) -> np.ndarray:
    """[-1, 1] float frames -> uint8 [0, 255] (reference scale_img +
    255)."""
    arr = np.asarray(frames, np.float32)
    arr = (np.clip(arr, -1.0, 1.0) + 1.0) * 127.5
    return arr.astype(np.uint8)


def write_video(frames: np.ndarray, path: str, fps: int = 25) -> str:
    """frames: (T, H, W, 3) uint8 RGB -> mp4 at ``path``."""
    assert cv2 is not None
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    T, H, W = frames.shape[:3]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(path, fourcc, fps, (W, H))
    for t in range(T):
        writer.write(cv2.cvtColor(frames[t], cv2.COLOR_RGB2BGR))
    writer.release()
    return path


def make_img_grid(imgs: np.ndarray, n_cols: int = 8,
                  pad: int = 2) -> np.ndarray:
    """(N, H, W, C) uint8 -> single grid image."""
    n, h, w, c = imgs.shape
    n_rows = (n + n_cols - 1) // n_cols
    grid = np.zeros((n_rows * (h + pad) - pad,
                     n_cols * (w + pad) - pad, c), imgs.dtype)
    for i in range(n):
        r, col = divmod(i, n_cols)
        grid[r * (h + pad):r * (h + pad) + h,
             col * (w + pad):col * (w + pad) + w] = imgs[i]
    return grid


def make_enrollment_strip(video: np.ndarray, n_frames: int = 8,
                          pad: int = 2) -> np.ndarray:
    """(T, H, W, C) -> horizontal filmstrip of n evenly spaced frames
    (reference make_enrollment, lib/logging.py:2680-2886)."""
    T = video.shape[0]
    idx = np.linspace(0, T - 1, n_frames).astype(int)
    return make_img_grid(video[idx], n_cols=n_frames, pad=pad)


def make_eval_grid(videos: Sequence[np.ndarray],
                   row_labels: Optional[Sequence[str]] = None,
                   pad: int = 2) -> np.ndarray:
    """Stack per-behavior videos into a (T, rows*H, W, C) grid video
    (behavior x start-pose grid, reference lib/logging.py:1548-1867)."""
    T = min(v.shape[0] for v in videos)
    rows = [v[:T] for v in videos]
    return np.concatenate(
        [np.pad(r, ((0, 0), (0, pad), (0, 0), (0, 0))) for r in rows],
        axis=1)


# -- 3D skeleton videos -----------------------------------------------------

_H36M_17_LINES = [
    (0, 1), (1, 2), (0, 14), (14, 15), (15, 16),   # right leg / arm
    (3, 4), (4, 5), (3, 11), (11, 12), (12, 13),   # left leg / arm
    (8, 9), (9, 10), (0, 6), (3, 6), (6, 7), (7, 8),
]


def plot_pose_3d(ax, pose: np.ndarray, lines=None, color="tab:blue"):
    """Draw one (K, 3) skeleton on a matplotlib 3D axis (Ax3DPose
    equivalent)."""
    lines = lines or _H36M_17_LINES
    for a, b in lines:
        if a < len(pose) and b < len(pose):
            ax.plot([pose[a, 0], pose[b, 0]],
                    [pose[a, 1], pose[b, 1]],
                    [pose[a, 2], pose[b, 2]], color=color, lw=2)


def create_video_3d(poses: np.ndarray, out_path: Optional[str] = None,
                    fps: int = 25, lines=None,
                    figsize=(4, 4)) -> np.ndarray:
    """(T, K, 3) world poses -> (T, H, W, 3) rendered frames (and mp4 when
    out_path given).  Matplotlib Agg, host-side."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mins = poses.reshape(-1, 3).min(0)
    maxs = poses.reshape(-1, 3).max(0)
    center = (mins + maxs) / 2
    radius = max((maxs - mins).max() / 2, 1e-3)

    frames = []
    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(111, projection="3d")
    for t in range(poses.shape[0]):
        ax.cla()
        plot_pose_3d(ax, poses[t], lines=lines)
        ax.set_xlim(center[0] - radius, center[0] + radius)
        ax.set_ylim(center[1] - radius, center[1] + radius)
        ax.set_zlim(center[2] - radius, center[2] + radius)
        ax.set_axis_off()
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(buf.copy())
    plt.close(fig)
    frames = np.stack(frames)
    if out_path is not None:
        write_video(frames, out_path, fps=fps)
    return frames


def text_to_vid(vid: np.ndarray, text: str, org: tuple,
                font_size: float = 0.7, font_thickness: int = 2):
    """Burn `text` into every frame at pixel coords `org` in place
    (reference lib/utils.py:889-911)."""
    assert cv2 is not None
    for k in range(vid.shape[0]):
        vid[k] = cv2.putText(vid[k], text, org, cv2.FONT_HERSHEY_SIMPLEX,
                             font_size, (0, 0, 0), font_thickness)
    return vid


def add_joints_to_img(img: np.ndarray, kps: np.ndarray, joints,
                      color_joints=((0, 0, 255),)):
    """Draw limb lines between keypoint pairs onto the image
    (reference lib/utils.py:733-751)."""
    assert cv2 is not None
    color_joints = list(color_joints)
    if len(color_joints) == 1:
        color_joints = [color_joints[0]] * len(joints)
    for i, jo in enumerate(joints):
        img = cv2.line(img, (int(kps[jo[0], 0]), int(kps[jo[0], 1])),
                       (int(kps[jo[1], 0]), int(kps[jo[1], 1])),
                       color=color_joints[i], thickness=3)
    return img


def save_png(img: np.ndarray, path: str) -> str:
    """(H, W, 3) uint8 RGB -> png at ``path``."""
    assert cv2 is not None
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(np.ascontiguousarray(img),
                                   cv2.COLOR_RGB2BGR))
    return path


def filmstrip(video: np.ndarray, disc_step: int = 6,
              pad: int = 2) -> np.ndarray:
    """(T, H, W, C) -> horizontal strip of every disc_step-th frame
    (the reference figures' ``[::disc_step]`` layout)."""
    sel = video[::disc_step]
    return make_img_grid(sel, n_cols=sel.shape[0], pad=pad)
