"""Pixel-aligned feature sampling: project 3D queries into every view,
bilinearly sample features, masked-average over views.

Pure-JAX reference for the decoder hot path (ref: model/transformer_parq.py:
129-161). The Pallas fused kernel (parq_tpu/kernels/pixel_align_pallas.py)
implements the same contract; this version doubles as its correctness oracle
and the CPU fallback.

No host syncs: the reference reads `camera.size` to the host per iteration
(transformer_parq.py:135); here the static feature size (W, H) is a Python
constant from config.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..geometry import Camera, Pose
from .grid_sample import grid_sample_bilinear


def pixel_aligned_features(
    memory_hw: jnp.ndarray,
    query_pos: jnp.ndarray,
    T_camera_local: Pose,
    camera: Camera,
    feat_size: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Args:
      memory_hw: (B, T, H, W, C) per-view feature maps (channels-last).
      query_pos: (B, Q, 3) query centers in the snippet-local frame
        (already denormalized to metric coords).
      T_camera_local: Pose (B, T) — local frame → each camera frame.
      camera: Camera (B, T) at feature-map scale.
      feat_size: static (W, H) of the feature maps.

    Returns:
      features: (B, Q, C) masked view-mean of sampled features.
      center_im: (B, T, Q, 2) projected pixel coords.
      center_valid: (B, T, Q) bool validity (in front & in image).
    """
    B, T, H, W, C = memory_hw.shape
    fw, fh = feat_size
    assert (fw, fh) == (W, H), f"feat_size {feat_size} != memory {(W, H)}"

    # local → camera for all views: (B, T, Q, 3)
    query_pos_c = T_camera_local.transform(query_pos[:, None, :, :])
    center_im, center_valid = camera.project(query_pos_c)

    # normalized grid, align_corners=True convention (ref: :148)
    gx = 2.0 * center_im[..., 0] / (W - 1) - 1.0
    gy = 2.0 * center_im[..., 1] / (H - 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)  # (B, T, Q, 2)

    Q = query_pos.shape[1]
    feats = grid_sample_bilinear(
        memory_hw.reshape(B * T, H, W, C), grid.reshape(B * T, Q, 2))
    feats = feats.reshape(B, T, Q, C)

    # masked mean over views (ref: :154-161): zero-valid queries divide by 1
    feats = jnp.sum(feats, axis=1)  # (B, Q, C)
    count = jnp.sum(center_valid.astype(feats.dtype), axis=1)  # (B, Q)
    count = jnp.where(count == 0, 1.0, count)
    feats = feats / count[..., None]
    return feats, center_im, center_valid
