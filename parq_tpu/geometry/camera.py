"""Pinhole camera as a flat (..., 6) array pytree.

Layout ``[w, h, fx, fy, cx, cy]`` — identical to the reference interchange
layout (ref: utils/wrappers.py:441-553) so checkpoints / batches stay
compatible. Pure-functional; static image size must be carried on the Python
side (width/height are traced values here, but model code reads the *static*
feature size from config, never from the array — no host syncs under jit).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple, Union

import jax
import jax.numpy as jnp

EPS = 1e-3  # z clamp used by the reference projector (utils/wrappers.py:442)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Camera:
    data: jnp.ndarray  # (..., 6)

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @classmethod
    def from_params(cls, width, height, fx, fy, cx, cy) -> "Camera":
        return cls(jnp.stack(
            [jnp.asarray(width, jnp.float32), jnp.asarray(height, jnp.float32),
             jnp.asarray(fx, jnp.float32), jnp.asarray(fy, jnp.float32),
             jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32)],
            axis=-1))

    @property
    def shape(self):
        return self.data.shape[:-1]

    @property
    def size(self) -> jnp.ndarray:
        """(w, h), shape (..., 2)."""
        return self.data[..., :2]

    @property
    def f(self) -> jnp.ndarray:
        return self.data[..., 2:4]

    @property
    def c(self) -> jnp.ndarray:
        return self.data[..., 4:6]

    def __getitem__(self, idx) -> "Camera":
        return Camera(self.data[idx])

    def reshape(self, *shape) -> "Camera":
        return Camera(self.data.reshape(*shape, 6))

    def scale(self, scales: Union[float, Tuple[float, float]]) -> "Camera":
        """Rescale intrinsics after an image resize.

        Matches the reference's half-pixel-aware principal point update
        ``(c + 0.5) * s - 0.5`` (ref: utils/wrappers.py:478-488).
        """
        if isinstance(scales, (int, float)):
            scales = (scales, scales)
        s = jnp.asarray(scales, dtype=self.data.dtype)
        return Camera(jnp.concatenate(
            [self.size * s, self.f * s, (self.c + 0.5) * s - 0.5], axis=-1))

    def crop(self, left_top: Tuple[float, float], size: Tuple[int, int]) -> "Camera":
        lt = jnp.asarray(left_top, dtype=self.data.dtype)
        sz = jnp.broadcast_to(jnp.asarray(size, dtype=self.data.dtype),
                              self.size.shape)
        return Camera(jnp.concatenate([sz, self.f, self.c - lt], axis=-1))

    def in_image(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """True where 2D points fall within [0, size-1] (ref: wrappers.py:501-508)."""
        size = self.size[..., None, :]
        return jnp.all((p2d >= 0) & (p2d <= size - 1), axis=-1)

    def project(self, p3d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project (..., N, 3) camera-frame points → pixel coords + validity.

        Semantics identical to ref utils/wrappers.py:510-522: z clamped to
        EPS, valid = (z > EPS) & in_image.
        """
        z = p3d[..., -1]
        in_front = z > EPS
        z = jnp.maximum(z, EPS)
        p2d = p3d[..., :2] / z[..., None]
        p2d = p2d * self.f[..., None, :] + self.c[..., None, :]
        valid = in_front & self.in_image(p2d)
        return p2d, valid

    def unproject(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Lift (..., N, 2) pixels to z=1 rays (..., N, 3) (ref: wrappers.py:524-550)."""
        xy = (uv - self.c[..., None, :]) / self.f[..., None, :]
        ones = jnp.ones(xy.shape[:-1] + (1,), dtype=xy.dtype)
        return jnp.concatenate([xy, ones], axis=-1)

    def __repr__(self):  # pragma: no cover
        return f"Camera{self.shape}"
