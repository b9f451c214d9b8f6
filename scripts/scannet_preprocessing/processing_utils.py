"""Offline preprocessing utilities for ScanNet + scan2cad.

Numpy re-derivation of the reference's preprocessing helpers
(ref: scripts/scannet_preprocessing/processing_utils.py), with the exact
protocol-defining math: TQS→matrix, box corners, the 9-class RayTran
category map, homogeneous depth backprojection, the edge-vector
point-in-box test, corner-projection FOV truncation, the difficulty
levels, and the four view-selection strategies (including the train
split's raw-frame-id overlap shifts ×10). Host-side only — the reference
ran the point-cloud math on CUDA; vectorized numpy is ample offline.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

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
    """scan2cad trs record → 4x4 with per-axis scale folded into the
    rotation columns (ref: make_M_from_tqs, processing_utils.py:19-29)."""
    T = np.eye(4)
    T[:3, :3] = quat_to_matrix(q) @ np.diag(s)
    T[:3, 3] = np.asarray(t)
    return T


def make_corners(bbox: np.ndarray) -> np.ndarray:
    """(6,) [xmin,xmax,ymin,ymax,zmin,zmax] → (8, 3) reference ordering
    (ref: get_corner_by_dims, processing_utils.py:74-86 — corners 0-3 at
    zmin, 4-7 at zmax, x alternating -++-)."""
    x0, x1, y0, y1, z0, z1 = bbox
    return np.array([
        [x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
        [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1],
    ])


# ---------------------------------------------------------------------------
# category mapping (9-class RayTran subset, ref: processing_utils.py:116-182)
# ---------------------------------------------------------------------------

CLASS_TO_INDEX_RAYTRAN = {
    "chair": 0, "table": 1, "cabinet": 2, "trashbin": 3, "bookshelf": 4,
    "display": 5, "sofa": 6, "bathtub": 7, "other": 8,
}

# scan2cad catid_cad (ShapeNet synset) → category name
CATID_TO_NAME = {
    "03211117": "display", "04379243": "table", "02808440": "bathtub",
    "02747177": "trashbin", "04256520": "sofa", "03001627": "chair",
    "02933112": "cabinet", "02871439": "bookshelf", "00000000": "other",
}


def catids_to_labels(catids: Sequence[str]) -> List[int]:
    """catid_cad list → RayTran class ids, unknowns → 'other'
    (ref: get_label + name2ids, processing_utils.py:185-204)."""
    return [CLASS_TO_INDEX_RAYTRAN[CATID_TO_NAME.get(str(c), "other")]
            for c in catids]


# ---------------------------------------------------------------------------
# depth → points, point-in-box, truncation, difficulty
# ---------------------------------------------------------------------------

def depth_to_point_cloud(depth: np.ndarray,
                         intrinsic_depth: np.ndarray) -> np.ndarray:
    """Depth map (H, W) in meters → (N, 3) camera-frame points with z > 0.

    Full resolution, homogeneous unprojection by the inverse 4x4 depth
    intrinsic — exactly the reference's construction
    (ref: get_point_cloud, processing_utils.py:132-154)."""
    h, w = depth.shape
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    pc = np.stack([xx * depth, yy * depth, depth, np.ones_like(depth)],
                  axis=2).reshape(-1, 4)
    pc = pc @ np.linalg.inv(intrinsic_depth).T
    return pc[pc[:, 2] > 0][:, :3]


def points_inside_corners(corners: np.ndarray,
                          points: np.ndarray) -> np.ndarray:
    """Count points inside each box given its 8 corners.

    corners (K, 8, 3), points (N, 3), same frame. The edge-vector test from
    corner 4 along the box edges v45/v40/v47: 0 < (p-c4)·v < v·v
    (ref: get_point_cloud_inside_box3d, processing_utils.py:237-263).
    Returns int64 (K,)."""
    c4 = corners[:, 4]                              # (K, 3)
    edges = np.stack([corners[:, 5] - c4, corners[:, 0] - c4,
                      corners[:, 7] - c4], axis=1)  # (K, 3 edges, 3)
    rel = points[None, :, :] - c4[:, None, :]       # (K, N, 3)
    m = np.einsum("knj,kej->kne", rel, edges)       # (K, N, 3 edges)
    vv = np.einsum("kej,kej->ke", edges, edges)     # (K, 3 edges)
    inside = np.all((m > 0) & (m < vv[:, None, :]), axis=-1)
    return inside.sum(axis=-1)


def fov_truncation_ratio(corners_camera: np.ndarray,
                         image_shape: Tuple[int, int],
                         intrinsic_color: np.ndarray) -> np.ndarray:
    """Visible-area ratio per box from camera-frame corners (K, 8, 3).

    Projects the 8 corners with the 4x4 color intrinsic, dividing by
    max(z, 1) — the reference's one-METER depth clamp, kept verbatim —
    takes the 2D AABB, and returns clipped-to-image area over
    max(raw area, 1). Higher = more visible
    (ref: get_box3d_inside_fov, processing_utils.py:206-234)."""
    h, w = image_shape[:2]
    K = corners_camera.shape[0]
    hom = np.concatenate([corners_camera, np.ones((K, 8, 1))], axis=-1)
    proj = hom @ intrinsic_color.T
    z = np.maximum(proj[..., 2], 1.0)
    u = proj[..., 0] / z
    v = proj[..., 1] / z
    xmin, xmax = u.min(-1), u.max(-1)
    ymin, ymax = v.min(-1), v.max(-1)
    area = (xmax - xmin) * (ymax - ymin)
    cx0, cx1 = np.clip(xmin, 0, w - 1), np.clip(xmax, 0, w - 1)
    cy0, cy1 = np.clip(ymin, 0, h - 1), np.clip(ymax, 0, h - 1)
    inside = (cx1 - cx0) * (cy1 - cy0)
    return inside / np.maximum(area, 1.0)


def get_level(num_points_inside: float, trunc_ratio: float) -> int:
    """Difficulty 0 (easy) … 3 (drop). trunc_ratio is the VISIBLE fraction
    (higher is better). Thresholds verbatim from the reference
    (ref: get_level, processing_utils.py:304-336)."""
    if num_points_inside > 1000 and trunc_ratio > 0.85:
        return 0
    if num_points_inside > 500 and trunc_ratio > 0.70:
        return 1
    if num_points_inside > 100 and trunc_ratio > 0.50:
        return 2
    return 3


# ---------------------------------------------------------------------------
# view selection (ref: processing_utils.py:352-505). All four strategies
# share the motion test: the angle between the two frames' VIEWING
# DIRECTIONS — arccos of the z component of R_cur^T R_last z — or the
# translation distance, strictly greater than the thresholds. NaN angles
# (numerical arccos overflow) fail the test, as in the reference.
# ---------------------------------------------------------------------------

def _moved(cur: np.ndarray, last: np.ndarray, min_angle: float,
           min_distance: float) -> bool:
    z = np.array([0.0, 0.0, 1.0])
    cos = (cur[:3, :3].T @ last[:3, :3] @ z)[2]
    with np.errstate(invalid="ignore"):
        angle = np.arccos(cos)
    dis = np.linalg.norm(cur[:3, 3] - last[:3, 3])
    return bool(angle > np.radians(min_angle)) or bool(dis > min_distance)


def select_keyframes(pose_dict: Dict[int, np.ndarray],
                     min_angle: float = 15.0,
                     min_distance: float = 0.1) -> List[int]:
    """First frame unconditional, then keep every frame that moved vs the
    last KEPT frame (ref: the shared selection loop of view_selection_w1 /
    _overlap / _allframes, processing_utils.py:386-419)."""
    kept: List[int] = []
    last = None
    for fid, pose in pose_dict.items():
        if last is None or _moved(pose, last, min_angle, min_distance):
            kept.append(fid)
            last = pose
    return kept


def view_selection_val(pose_dict: Dict[int, np.ndarray], window: int = 3,
                       min_angle: float = 15.0,
                       min_distance: float = 0.1) -> List[List[int]]:
    """Val split: windows accumulate DURING selection — after a window
    completes the state resets, so the next frame starts the next window
    unconditionally; an unfinished tail window is dropped
    (ref: view_selection, processing_utils.py:352-384)."""
    out: List[List[int]] = []
    cur: List[int] = []
    last = None
    for fid, pose in pose_dict.items():
        if not cur:
            cur.append(fid)
            last = pose
        elif _moved(pose, last, min_angle, min_distance):
            cur.append(fid)
            last = pose
            if len(cur) == window:
                out.append(cur)
                cur = []
                last = None
    return out


def view_selection_w1(pose_dict: Dict[int, np.ndarray],
                      min_angle: float = 15.0,
                      min_distance: float = 0.1) -> List[List[int]]:
    """Single-frame snippets of every keyframe
    (ref: view_selection_w1, processing_utils.py:386-418)."""
    return [[k] for k in select_keyframes(pose_dict, min_angle,
                                          min_distance)]


def view_selection_overlap(pose_dict: Dict[int, np.ndarray],
                           window: int = 3, min_angle: float = 15.0,
                           min_distance: float = 0.1) -> List[List[int]]:
    """Train split: keyframe windows duplicated at RAW-frame-id shifts
    +0..+9. A shifted window is kept only when its last id stays within
    the scene and every shifted id has a pose; duplicates are removed
    preserving first-occurrence order
    (ref: view_selection_overlap, processing_utils.py:421-466)."""
    ids = select_keyframes(pose_dict, min_angle, min_distance)
    if not pose_dict:
        return []
    last_id = list(pose_dict.keys())[-1]
    out: List[List[int]] = []
    for i in range(10):
        for j in range(len(ids)):
            if j + window <= len(ids):
                win = ids[j:j + window]
                if win[-1] + i <= last_id:
                    shifted = [f + i for f in win if f + i in pose_dict]
                    if len(shifted) == window and shifted not in out:
                        out.append(shifted)
    return out


def view_selection_allframes(pose_dict: Dict[int, np.ndarray],
                             min_angle: float = 15.0,
                             min_distance: float = 0.1) -> List[List[int]]:
    """One snippet holding every keyframe
    (ref: view_selection_allframes, processing_utils.py:469-505)."""
    return [select_keyframes(pose_dict, min_angle, min_distance)]


def view_selection(pose_dict: Dict[int, np.ndarray], window: int = 3,
                   variant: str = "overlap", min_angle: float = 15.0,
                   min_distance: float = 0.1) -> List[List[int]]:
    """Dispatch over the four reference strategies. 'overlap' = train,
    'nonoverlap' = val, plus 'w1' and 'allframes'
    (ref: save_snippet_pkl dispatch,
    generate_scannet_anno_snippet.py:146-158)."""
    if variant == "overlap":
        return view_selection_overlap(pose_dict, window, min_angle,
                                      min_distance)
    if variant == "nonoverlap":
        if window == 1:
            return view_selection_w1(pose_dict, min_angle, min_distance)
        return view_selection_val(pose_dict, window, min_angle, min_distance)
    if variant == "w1":
        return view_selection_w1(pose_dict, min_angle, min_distance)
    if variant == "allframes":
        return view_selection_allframes(pose_dict, min_angle, min_distance)
    raise ValueError(variant)


def split_list(items: List, n: int) -> List[List]:
    """Round-robin shard a work list over n workers."""
    return [items[i::n] for i in range(n)]
