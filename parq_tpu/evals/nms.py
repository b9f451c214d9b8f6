"""3D NMS over axis-aligned world bounds — host numpy + on-device variant.

Host path mirrors ref utils/nms.py:20-224 (VoteNet-derived greedy NMS on
per-box world AABBs). The on-device variant (`nms_mask_device`) is a masked
fixed-K O(K²) greedy pass for the streaming/demo path where no host sync is
wanted.
"""
from __future__ import annotations

import numpy as np


def corners_to_aabb_rows(pred_corners: np.ndarray, scores: np.ndarray,
                         labels: np.ndarray) -> np.ndarray:
    """(B,K,8,3) corners → (B,K,8) rows [min xyz, max xyz, score, class]."""
    rows = np.zeros(pred_corners.shape[:2] + (8,))
    rows[..., 0:3] = pred_corners.min(axis=2)
    rows[..., 3:6] = pred_corners.max(axis=2)
    rows[..., 6] = scores
    rows[..., 7] = labels
    return rows


def _greedy(boxes: np.ndarray, overlap_threshold: float,
            same_class: bool) -> list:
    """score-descending greedy pick (ref: nms_3d_faster[_samecls])."""
    if len(boxes) == 0:
        return []
    x1, y1, z1, x2, y2, z2 = (boxes[:, i] for i in range(6))
    score = boxes[:, 6]
    cls = boxes[:, 7]
    area = (x2 - x1) * (y2 - y1) * (z2 - z1)
    order = np.argsort(score)
    pick = []
    while order.size:
        i = order[-1]
        pick.append(int(i))
        rest = order[:-1]
        l = np.maximum(0, np.minimum(x2[i], x2[rest]) - np.maximum(x1[i], x1[rest]))
        w = np.maximum(0, np.minimum(y2[i], y2[rest]) - np.maximum(y1[i], y1[rest]))
        h = np.maximum(0, np.minimum(z2[i], z2[rest]) - np.maximum(z1[i], z1[rest]))
        inter = l * w * h
        o = inter / (area[i] + area[rest] - inter)
        if same_class:
            o = o * (cls[i] == cls[rest])
        order = rest[o <= overlap_threshold]
    return pick


def run_nms(pred_corners: np.ndarray, labels: np.ndarray, scores: np.ndarray,
            num_semcls: int, overlap_threshold: float,
            nms_type: str = "nms_3d_faster") -> np.ndarray:
    """(B,K,8,3) world corners → (B,K) bool keep mask (ref: nms.py:34-70).
    Uses the C++ native greedy pass when available."""
    from .. import native
    B, K = pred_corners.shape[:2]
    rows = corners_to_aabb_rows(pred_corners, scores, labels)
    same = nms_type == "nms_3d_faster_samecls"
    mask = np.zeros((B, K), bool)
    use_native = native.get_lib() is not None
    for b in range(B):
        fg = np.where(labels[b] != num_semcls)[0]
        if use_native:
            keep = native.nms3d(rows[b, fg], overlap_threshold, same)
            mask[b, fg[keep]] = True
        else:
            pick = _greedy(rows[b, fg], overlap_threshold, same_class=same)
            mask[b, fg[pick]] = True
    return mask


def nms_mask_device(corners, scores, labels, num_semcls: int,
                    overlap_threshold: float, same_class: bool = False):
    """On-device masked greedy NMS (fixed K, O(K²) suppression matrix).

    corners: (K, 8, 3); scores: (K,); labels: (K,) int. Returns (K,) bool.
    Greedy semantics match the host version: iterate in score order, keep a
    box iff no higher-scoring kept box overlaps it beyond the threshold.
    """
    import jax
    import jax.numpy as jnp

    lo = corners.min(axis=1)
    hi = corners.max(axis=1)
    inter = jnp.prod(
        jnp.maximum(0.0, jnp.minimum(hi[:, None], hi[None]) -
                    jnp.maximum(lo[:, None], lo[None])), axis=-1)
    vol = jnp.prod(hi - lo, axis=-1)
    iou = inter / (vol[:, None] + vol[None] - inter + 1e-12)
    if same_class:
        iou = iou * (labels[:, None] == labels[None])
    fg = labels != num_semcls

    order = jnp.argsort(-scores)
    K = scores.shape[0]

    def body(i, keep):
        idx = order[i]
        # suppressed if any higher-ranked kept fg box overlaps
        rank_mask = jnp.arange(K) < i
        higher_kept = keep[order] & rank_mask & fg[order]
        overlap = iou[idx, order] > overlap_threshold
        suppressed = jnp.any(higher_kept & overlap)
        return keep.at[idx].set(fg[idx] & ~suppressed)

    keep = jax.lax.fori_loop(0, K, body, jnp.zeros((K,), bool))
    return keep
