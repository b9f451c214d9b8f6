"""Bilinear grid sampling with PyTorch `F.grid_sample` semantics.

The decoder's hot path samples pixel-aligned features at projected query
locations with ``padding_mode='zeros', align_corners=True``
(ref: model/transformer_parq.py:152). Checkpoint parity requires matching
those semantics exactly; this is the pure-JAX reference implementation (the
Pallas kernel in parq_tpu/kernels re-derives the same math fused).

Layout note: unlike torch (NCHW), features here are channels-last (N, H, W, C)
— the natural TPU layout (lane dim = channels).
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample_bilinear(features: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample `features` at normalized `grid` locations.

    Args:
      features: (N, H, W, C)
      grid: (N, P, 2) normalized coords in [-1, 1], (x, y) order,
        align_corners=True convention: -1 → pixel 0, +1 → pixel (W-1 / H-1).
    Returns:
      (N, P, C); out-of-bounds neighbors contribute zeros.
    """
    N, H, W, C = features.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)  # (N, P)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        """Gather features[n, iy, ix] with zero padding outside."""
        inb = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        flat = features.reshape(N, H * W, C)
        idx = iyc * W + ixc  # (N, P)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (N, P, C)
        return vals * inb[..., None].astype(features.dtype)

    out = (gather(x0, y0) * (wx0 * wy0)[..., None]
           + gather(x1, y0) * (wx1 * wy0)[..., None]
           + gather(x0, y1) * (wx0 * wy1)[..., None]
           + gather(x1, y1) * (wx1 * wy1)[..., None])
    return out
