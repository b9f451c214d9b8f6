"""Ray positional encoding module.

For every feature-map pixel: unproject to `num_samples` log-spaced depth
points along the camera ray, transform into the snippet-local frame, min-max
normalize by the scene scale box, inverse-sigmoid, flatten, and encode with a
2-layer MLP (ref: model/ray_positional_encoding.py:29-139).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..geometry import (Camera, Pose, grid_2d, inverse_sigmoid,
                        ray_points_snippet_fused)
from .mlp import MLP2


class AddRayPE(nn.Module):
    dim_out: int = 1024
    ray_points_scale: Tuple[float, ...] = (-2.0, 2.0, -1.5, 0.0, 0.25, 4.25)
    num_samples: int = 64
    min_depth: float = 0.25
    max_depth: float = 5.25
    feat_size: Tuple[int, int] = (80, 60)  # static (W, H); the reference
    # reads it from camera.size on host (ref: :81-83) — here it's config.
    dtype: object = None

    @nn.compact
    def __call__(self, camera: Camera, T_camera_pseudoCam: Pose,
                 T_world_pseudoCam: Pose, T_world_local: Pose) -> jnp.ndarray:
        """Returns the per-pixel encoding (B, T, H, W, dim_out)."""
        W, H = self.feat_size
        pos_2d = grid_2d(W, H)
        T_local_world = T_world_local.inverse()
        pts = ray_points_snippet_fused(
            pos_2d, camera, T_camera_pseudoCam, T_world_pseudoCam,
            T_local_world, self.num_samples, self.min_depth, self.max_depth)
        # (B, T, H, W, n, 3) → normalize by scale box then inverse_sigmoid
        s = self.ray_points_scale
        pts = jnp.stack([
            (pts[..., 0] - s[0]) / (s[1] - s[0]),
            (pts[..., 1] - s[2]) / (s[3] - s[2]),
            (pts[..., 2] - s[4]) / (s[5] - s[4]),
        ], axis=-1)
        pts = inverse_sigmoid(pts)
        B, T = pts.shape[:2]
        flat = pts.reshape(B, T, H, W, self.num_samples * 3)
        if self.dtype is not None:
            flat = flat.astype(self.dtype)
        return MLP2(self.dim_out, self.dim_out,
                    dtype=self.dtype or jnp.float32, name="encoder")(flat)
