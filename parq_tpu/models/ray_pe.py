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

from ..geometry import (Camera, Pose, depth_planes, grid_2d,
                        inverse_sigmoid, ray_dirs_snippet)
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
        n = self.num_samples
        pos_2d = grid_2d(W, H)
        T_local_world = T_world_local.inverse()
        # factored rays: sample point = rdir · depth_n + t. Assemble the
        # sample axis CHANNEL-MAJOR (…, 3, n) so every elementwise pass
        # (normalize, logit) runs on an n-wide (release: 192-lane flat)
        # minor dim — the (…, n, 3) order of the reference would sit on a
        # 3-wide minor dim on TPU. The checkpoint's sample-major weight
        # convention is restored by folding the static permutation into
        # the encoder's first kernel (MLP2.in_perm).
        rdir, t = ray_dirs_snippet(pos_2d, camera, T_camera_pseudoCam,
                                   T_world_pseudoCam, T_local_world)
        d = depth_planes(n, self.min_depth, self.max_depth, rdir.dtype)
        s = self.ray_points_scale
        lo = jnp.asarray([s[0], s[2], s[4]], rdir.dtype)
        span = jnp.asarray([s[1] - s[0], s[3] - s[2], s[5] - s[4]],
                           rdir.dtype)
        pts = (rdir[..., None] * d + t[:, :, None, :, None])  # (B,T,HW,3,n)
        pts = (pts - lo[:, None]) / span[:, None]
        pts = inverse_sigmoid(pts)
        B, T = pts.shape[:2]
        flat = pts.reshape(B, T, H, W, 3 * n)
        if self.dtype is not None:
            flat = flat.astype(self.dtype)
        perm = tuple((i % n) * 3 + i // n for i in range(3 * n))
        return MLP2(self.dim_out, self.dim_out,
                    dtype=self.dtype or jnp.float32, in_perm=perm,
                    name="encoder")(flat)
