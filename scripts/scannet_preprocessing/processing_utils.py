"""Offline preprocessing utilities for ScanNet + scan2cad.

Numpy re-derivation of the reference's preprocessing helpers
(ref: scripts/scannet_preprocessing/processing_utils.py): TQS→matrix,
box corners, the 9-class RayTran category map, depth backprojection,
point-in-OBB tests, FOV truncation, difficulty levels, and the four view
selection strategies. Host-side only (the reference used CUDA for the point
clouds; numpy is ample for offline work).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# scan2cad alignment: translation / quaternion / scale → 4x4
# ---------------------------------------------------------------------------

def quat_to_matrix(q: Sequence[float]) -> np.ndarray:
    """(w, x, y, z) quaternion → 3x3 rotation."""
    w, x, y, z = q
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array([
        [1 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1 - (xx + yy)],
    ])


def tqs_to_matrix(t: Sequence[float], q: Sequence[float],
                  s: Sequence[float]) -> np.ndarray:
    """scan2cad trs record → 4x4 (rotation+translation; scale applied to the
    box extents separately, as the reference does)."""
    T = np.eye(4)
    T[:3, :3] = quat_to_matrix(q)
    T[:3, 3] = np.asarray(t)
    return T


def make_corners(bbox: np.ndarray) -> np.ndarray:
    """(6,) [xmin,xmax,ymin,ymax,zmin,zmax] → (8, 3) reference ordering."""
    x0, x1, y0, y1, z0, z1 = bbox
    return np.array([
        [x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
        [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1],
    ])


# ---------------------------------------------------------------------------
# category mapping (9-class RayTran subset, ref: processing_utils.py:116-129)
# ---------------------------------------------------------------------------

CARE_CATEGORY = {
    "chair": 0, "table": 1, "cabinet": 2, "trash bin": 3, "bookshelf": 4,
    "display": 5, "sofa": 6, "bathtub": 7, "other": 8,
}

# scan2cad catid_cad prefixes → category name (ShapeNet synsets)
SYNSET_TO_NAME = {
    "03001627": "chair", "04379243": "table", "02933112": "cabinet",
    "02747177": "trash bin", "02871439": "bookshelf", "03211117": "display",
    "04256520": "sofa", "02808440": "bathtub",
}


def synset_to_label(catid_cad: str) -> int:
    return CARE_CATEGORY[SYNSET_TO_NAME.get(str(catid_cad), "other")]


# ---------------------------------------------------------------------------
# depth → points, point-in-box, truncation, difficulty
# ---------------------------------------------------------------------------

def depth_to_points(depth: np.ndarray, intrinsic: np.ndarray,
                    T_world_camera: np.ndarray,
                    stride: int = 4) -> np.ndarray:
    """Depth map (H, W) in meters → (N, 3) world points (strided)."""
    H, W = depth.shape
    v, u = np.mgrid[0:H:stride, 0:W:stride]
    d = depth[::stride, ::stride]
    valid = d > 0
    u, v, d = u[valid], v[valid], d[valid]
    x = (u - intrinsic[0, 2]) / intrinsic[0, 0] * d
    y = (v - intrinsic[1, 2]) / intrinsic[1, 1] * d
    pts_c = np.stack([x, y, d], axis=-1)
    R = T_world_camera[:3, :3]
    t = T_world_camera[:3, 3]
    return pts_c @ R.T + t


def points_in_obb(points: np.ndarray, bbox: np.ndarray,
                  T_world_object: np.ndarray) -> np.ndarray:
    """(N,3) world points inside the oriented box → bool (N,)."""
    R = T_world_object[:3, :3]
    t = T_world_object[:3, 3]
    local = (points - t) @ R  # R is orthonormal: inverse = transpose
    return ((local[:, 0] >= bbox[0]) & (local[:, 0] <= bbox[1])
            & (local[:, 1] >= bbox[2]) & (local[:, 1] <= bbox[3])
            & (local[:, 2] >= bbox[4]) & (local[:, 2] <= bbox[5]))


def truncation_ratio(corners_world: np.ndarray, intrinsic: np.ndarray,
                     T_world_camera: np.ndarray, width: int,
                     height: int, samples: int = 6) -> float:
    """Fraction of box volume-sample points projecting OUTSIDE the image
    (0 = fully visible, 1 = fully truncated)."""
    # dense grid of sample points inside the box (in world frame)
    lo = corners_world.min(0)
    hi = corners_world.max(0)
    lin = [np.linspace(lo[i], hi[i], samples) for i in range(3)]
    g = np.stack(np.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3)
    R = T_world_camera[:3, :3]
    t = T_world_camera[:3, 3]
    cam = (g - t) @ R
    z = cam[:, 2]
    u = cam[:, 0] / np.maximum(z, 1e-6) * intrinsic[0, 0] + intrinsic[0, 2]
    v = cam[:, 1] / np.maximum(z, 1e-6) * intrinsic[1, 1] + intrinsic[1, 2]
    inside = (z > 1e-3) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    return 1.0 - inside.mean()


def difficulty_level(num_points_inside: int, trunc: float) -> int:
    """0 easy … 3 drop (ref filters difficulty ≥ 3,
    generate_scannet_anno_snippet.py:320-329)."""
    if num_points_inside >= 2000 and trunc < 0.3:
        return 0
    if num_points_inside >= 500 and trunc < 0.6:
        return 1
    if num_points_inside >= 100 and trunc < 0.9:
        return 2
    return 3


# ---------------------------------------------------------------------------
# view selection (ref: processing_utils.py:352-505)
# ---------------------------------------------------------------------------

def _pose_delta(Ta: np.ndarray, Tb: np.ndarray):
    R = Ta[:3, :3].T @ Tb[:3, :3]
    cos = np.clip((np.trace(R) - 1) / 2, -1, 1)
    dr = np.degrees(np.arccos(cos))
    dt = np.linalg.norm(Ta[:3, 3] - Tb[:3, 3])
    return dr, dt


def select_keyframes(poses: List[np.ndarray], min_angle: float = 15.0,
                     min_distance: float = 0.1) -> List[int]:
    """Keep frames that moved ≥ min_angle deg or ≥ min_distance m since the
    last kept frame."""
    kept = [0]
    for i in range(1, len(poses)):
        if not np.all(np.isfinite(poses[i])):
            continue
        dr, dt = _pose_delta(poses[kept[-1]], poses[i])
        if dr >= min_angle or dt >= min_distance:
            kept.append(i)
    return kept


def view_selection(keyframes: List[int], window: int = 3,
                   variant: str = "overlap") -> List[List[int]]:
    """Group keyframes into snippets.

    variants (ref: the four view_selection* strategies):
      'overlap'   — train: windows shifted by 1 (dense overlap)
      'nonoverlap'— val: disjoint windows
      'w1'        — window of 1 (single frame)
      'allframes' — one snippet containing everything
    """
    n = len(keyframes)
    if variant == "overlap":
        return [keyframes[i:i + window] for i in range(0, n - window + 1)]
    if variant == "nonoverlap":
        return [keyframes[i:i + window] for i in range(0, n - window + 1,
                                                       window)]
    if variant == "w1":
        return [[k] for k in keyframes]
    if variant == "allframes":
        return [keyframes]
    raise ValueError(variant)


def split_list(items: List, n: int) -> List[List]:
    """Round-robin shard a work list over n workers."""
    return [items[i::n] for i in range(n)]
