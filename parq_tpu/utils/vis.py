"""Visualization: 3D box wireframe overlays and feature-map PCA compression.

Host-side (numpy + cv2), mirroring ref utils/parq_utils.py:108-211 and
utils/vis_utils.py:6-17. cv2 is gated so headless installs without it can
still train.
"""
from __future__ import annotations

import colorsys
import itertools
from fractions import Fraction
from typing import Dict, List, Optional, Sequence

import numpy as np

FACES = [
    [0, 1, 2, 3], [0, 3, 7, 4], [0, 4, 5, 1],
    [1, 2, 6, 5], [2, 6, 7, 3], [7, 4, 5, 6],
]


def _infinite_hues():
    yield Fraction(0)
    for k in itertools.count():
        i = 2 ** k
        for j in range(1, i, 2):
            yield Fraction(j, i)


def get_colors(n: int) -> List[tuple]:
    """Deterministic distinct colors (ref: parq_utils.py:119-138)."""
    def hsvs():
        for h in _infinite_hues():
            for s in [Fraction(6, 10)]:
                for v in [Fraction(6, 10), Fraction(9, 10)]:
                    yield (h, s, v)
    rgbs = (colorsys.hsv_to_rgb(*hsv) for hsv in hsvs())
    return [tuple(float(c) for c in rgb)
            for rgb in itertools.islice(rgbs, n)]


def _project(corners_c: np.ndarray, cam: np.ndarray):
    """(…, 8, 3) camera-frame corners → pixel coords + validity (host mirror
    of Camera.project, utils/wrappers.py:510-522)."""
    w, h, fx, fy, cx, cy = cam
    z = np.maximum(corners_c[..., 2], 1e-3)
    u = corners_c[..., 0] / z * fx + cx
    v = corners_c[..., 1] / z * fy + cy
    valid = ((corners_c[..., 2] > 1e-3) & (u >= 0) & (u <= w - 1)
             & (v >= 0) & (v <= h - 1))
    return np.stack([u, v], -1), valid


def draw_detections(
    imgs: np.ndarray,              # (T, H, W, 3) float [0, 1]
    cams: np.ndarray,              # (T, 6)
    box_corners_object: np.ndarray,  # (N, 8, 3)
    T_world_object: np.ndarray,      # (N, 12) flat poses (world == local here)
    T_pseudoCam_world: np.ndarray,   # (T, 12)
    T_camera_pseudoCam: np.ndarray,  # (T, 12)
    labels: np.ndarray,              # (N,)
    num_semcls: int,
    mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Wireframe overlays per view; returns (T*H, W, 3) stacked image
    (ref: parq_utils.py:141-211 draws per-face edges with per-class color)."""
    import cv2

    id2color = get_colors(num_semcls)
    T = imgs.shape[0]
    out_views = []

    def apply12(p, pts):
        R = p[:9].reshape(3, 3)
        return pts @ R.T + p[9:]

    for t in range(T):
        img = imgs[t].copy()
        img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
        for n in range(box_corners_object.shape[0]):
            sem = int(labels[n])
            if sem == num_semcls or sem < 0:
                continue
            if mask is not None and not mask[n]:
                continue
            color = id2color[sem]
            cw = apply12(T_world_object[n], box_corners_object[n])
            cp = apply12(T_pseudoCam_world[t], cw)
            cc = apply12(T_camera_pseudoCam[t], cp)
            uv, valid = _project(cc, cams[t])
            for face in FACES:
                for i in range(len(face) - 1):
                    a, b = face[i], face[i + 1]
                    if valid[a] and valid[b]:
                        img = cv2.line(
                            img,
                            tuple(uv[a].astype(int).tolist()),
                            tuple(uv[b].astype(int).tolist()),
                            color, thickness=2)
        out_views.append(img)
    return np.concatenate(out_views, axis=0)


def pca_compress(feat: np.ndarray) -> np.ndarray:
    """(H, W, C) → (H, W, 3) via PCA (ref: vis_utils.py:6-13)."""
    H, W, C = feat.shape
    x = feat.reshape(-1, C).astype(np.float64)
    x = x - x.mean(0, keepdims=True)
    _, _, Vt = np.linalg.svd(x, full_matrices=False)
    y = x @ Vt[:3].T
    return y.reshape(H, W, 3).astype(np.float32)


def normalize_img(img: np.ndarray) -> np.ndarray:
    return (img - img.min()) / max(img.max() - img.min(), 1e-6)
