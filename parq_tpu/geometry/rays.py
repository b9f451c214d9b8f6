"""Ray positional-encoding geometry: pixel grids and log-spaced ray samples.

Pure batched jnp re-derivation of ref utils/encoding_utils.py. Everything is
shape-static: (B, T) are leading batch axes, (H, W) compile-time constants.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import Camera
from .pose import Pose


def grid_2d(width: int, height: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) pixel-coordinate grid, x = 0..W-1, y = 0..H-1.

    Matches ref utils/encoding_utils.py:15-20 with
    output_range=[0, w, 0, h] (linspace(0, w, w+1)[:-1] == arange(w)).
    """
    x = jnp.arange(width, dtype=dtype)
    y = jnp.arange(height, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    return jnp.stack([xx, yy], axis=-1)


def depth_planes(num_samples: int, min_depth: float, max_depth: float,
                 dtype=jnp.float32) -> jnp.ndarray:
    """(num_samples,) log-spaced depths (ref: encoding_utils.py:82-88)."""
    ramp = jnp.linspace(0.0, 1.0, num_samples, dtype=dtype)
    return jnp.exp(jnp.log(min_depth) + jnp.log(max_depth / min_depth) * ramp)


def ray_points(pixel_grid: jnp.ndarray, camera: Camera,
               T_camera_pseudoCam: Pose, num_samples: int,
               min_depth: float, max_depth: float) -> jnp.ndarray:
    """Sample 3D points along every pixel ray, in the pseudoCam frame.

    Args:
      pixel_grid: (H, W, 2)
      camera: Camera with batch shape (B,)
      T_camera_pseudoCam: Pose with batch shape (B,)
    Returns:
      (B, H, W, num_samples, 3)  (ref: encoding_utils.py:74-101)
    """
    H, W = pixel_grid.shape[:2]
    B = camera.data.shape[0]
    pix = jnp.broadcast_to(pixel_grid.reshape(1, H * W, 2), (B, H * W, 2))
    rays = camera.unproject(pix)  # (B, HW, 3), z = 1
    d = depth_planes(num_samples, min_depth, max_depth, rays.dtype)
    pts = rays[:, :, None, :] * d[None, None, :, None]  # (B, HW, n, 3)
    pts = pts.reshape(B, H * W * num_samples, 3)
    pts = T_camera_pseudoCam.inverse().transform(pts)
    return pts.reshape(B, H, W, num_samples, 3)


def ray_points_snippet(pixel_grid: jnp.ndarray, camera: Camera,
                       T_camera_pseudoCam: Pose, T_world_pseudoCam: Pose,
                       T_local_world: Pose, num_samples: int,
                       min_depth: float, max_depth: float) -> jnp.ndarray:
    """Per-view ray samples expressed in the snippet-local frame.

    Args:
      pixel_grid: (H, W, 2)
      camera: Camera (B, T)
      T_camera_pseudoCam, T_world_pseudoCam: Pose (B, T)
      T_local_world: Pose (B, 1) or (B,)
    Returns:
      (B, T, H, W, num_samples, 3)  (ref: encoding_utils.py:23-71)
    """
    B, T = T_camera_pseudoCam.shape[:2]
    H, W = pixel_grid.shape[:2]
    cam_flat = camera.reshape(B * T)
    Tcp_flat = T_camera_pseudoCam.reshape(B * T)
    pts = ray_points(pixel_grid, cam_flat, Tcp_flat, num_samples,
                     min_depth, max_depth)  # (B*T, H, W, n, 3)

    if T_local_world.data.ndim == 2:  # (B, 12) -> (B, 1, 12)
        T_local_world = Pose(T_local_world.data[:, None, :])
    T_local_pseudoCam = (T_local_world @ T_world_pseudoCam).reshape(B * T)
    pts = T_local_pseudoCam.transform(pts.reshape(B * T, -1, 3))
    return pts.reshape(B, T, H, W, num_samples, 3)


def ray_points_snippet_fused(pixel_grid: jnp.ndarray, camera: Camera,
                             T_camera_pseudoCam: Pose,
                             T_world_pseudoCam: Pose,
                             T_local_world: Pose, num_samples: int,
                             min_depth: float, max_depth: float
                             ) -> jnp.ndarray:
    """Same result as :func:`ray_points_snippet`, restructured for TPU:

    R @ (ray · d) + t == (R @ ray) · d + t — so the pose rotation applies
    to the H·W ray *directions* once instead of to all H·W·num_samples
    sample points, and the per-sample work collapses to a broadcasted
    mul-add that XLA fuses with the normalize/logit consumer. Cuts the
    rayPE geometry from 3 HBM-materialized (…, n, 3) passes to one.
    """
    B, T = T_camera_pseudoCam.shape[:2]
    H, W = pixel_grid.shape[:2]
    pix = jnp.broadcast_to(pixel_grid.reshape(1, H * W, 2),
                           (B * T, H * W, 2))
    rays = camera.reshape(B * T).unproject(pix)          # (BT, HW, 3)

    if T_local_world.data.ndim == 2:
        T_local_world = Pose(T_local_world.data[:, None, :])
    rdir, t = ray_dirs_snippet(pixel_grid, camera, T_camera_pseudoCam,
                               T_world_pseudoCam, T_local_world)
    d = depth_planes(num_samples, min_depth, max_depth, rdir.dtype)
    pts = (rdir.reshape(B * T, H * W, 1, 3) * d[None, None, :, None]
           + t.reshape(B * T, 1, 1, 3))                  # (BT, HW, n, 3)
    return pts.reshape(B, T, H, W, num_samples, 3)


def ray_dirs_snippet(pixel_grid: jnp.ndarray, camera: Camera,
                     T_camera_pseudoCam: Pose, T_world_pseudoCam: Pose,
                     T_local_world: Pose):
    """Per-view ray DIRECTIONS in the snippet-local frame, plus the frame
    translation — the factored form of :func:`ray_points_snippet_fused`
    (sample point n = rdir · depth_n + t). Lets the consumer assemble the
    (…, samples) axis in whatever layout it wants: the (…, n, 3) point
    tensor has a 3-wide minor dim, which on TPU either lane-pads 3→128 or
    forces a relayout before the (…, n·3) flatten; building (…, 3, n)
    channel-major instead keeps every elementwise pass full-width.

    Returns: rdir (B, T, H·W, 3), t (B, T, 3).
    """
    B, T = T_camera_pseudoCam.shape[:2]
    H, W = pixel_grid.shape[:2]
    pix = jnp.broadcast_to(pixel_grid.reshape(1, H * W, 2),
                           (B * T, H * W, 2))
    rays = camera.reshape(B * T).unproject(pix)          # (BT, HW, 3)

    if T_local_world.data.ndim == 2:
        T_local_world = Pose(T_local_world.data[:, None, :])
    T_local_pseudoCam = T_local_world @ T_world_pseudoCam
    T_local_cam = (T_local_pseudoCam.reshape(B * T)
                   @ T_camera_pseudoCam.reshape(B * T).inverse())
    # HIGHEST: geometry must not drop to the v5e default bf16 matmul
    # precision (CLAUDE.md; pose.py transform uses explicit mul/add for
    # the same reason)
    rdir = jnp.einsum("bij,bnj->bni", T_local_cam.R, rays,
                      precision=jax.lax.Precision.HIGHEST)  # (BT, HW, 3)
    return (rdir.reshape(B, T, H * W, 3),
            T_local_cam.t.reshape(B, T, 3))


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """logit with the reference's double clamp (ref: ray_positional_encoding.py:22-26)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.maximum(x, eps)
    x2 = jnp.maximum(1.0 - x, eps)
    return jnp.log(x1 / x2)
