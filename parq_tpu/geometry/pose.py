"""SE(3) pose as a flat (..., 12) array pytree.

Layout: ``[R.reshape(9) (row-major), t (3)]`` — the same interchange layout the
reference uses (ref: utils/wrappers.py:194-293), chosen because a flat
last-dim vector is a natural XLA layout and checkpoints stay byte-compatible.

All operations are pure jnp functions; :class:`Pose` is a registered pytree so
it passes transparently through ``jit`` / ``vmap`` / ``scan``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


def _apply_R(R: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """R (..., 3, 3) applied to vectors v (..., 3), elementwise math."""
    return jnp.stack([
        R[..., i, 0] * v[..., 0] + R[..., i, 1] * v[..., 1]
        + R[..., i, 2] * v[..., 2]
        for i in range(3)], axis=-1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Pose:
    """Batch of SE(3) transforms stored as (..., 12) arrays."""

    data: jnp.ndarray  # (..., 12)

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # -- constructors ----------------------------------------------------
    @classmethod
    def from_Rt(cls, R: jnp.ndarray, t: jnp.ndarray) -> "Pose":
        """R: (..., 3, 3), t: (..., 3)."""
        R = jnp.asarray(R)
        t = jnp.asarray(t)
        flat = R.reshape(R.shape[:-2] + (9,))
        return cls(jnp.concatenate([flat, t], axis=-1))

    @classmethod
    def from_4x4mat(cls, T: jnp.ndarray) -> "Pose":
        T = jnp.asarray(T)
        return cls.from_Rt(T[..., :3, :3], T[..., :3, 3])

    @classmethod
    def identity(cls, batch_shape: Tuple[int, ...] = ()) -> "Pose":
        eye = jnp.eye(3).reshape(9)
        data = jnp.concatenate([eye, jnp.zeros(3)])
        return cls(jnp.broadcast_to(data, batch_shape + (12,)))

    # -- views ------------------------------------------------------------
    @property
    def shape(self):
        return self.data.shape[:-1]

    @property
    def R(self) -> jnp.ndarray:
        """(..., 3, 3) rotation."""
        r = self.data[..., :9]
        return r.reshape(r.shape[:-1] + (3, 3))

    @property
    def t(self) -> jnp.ndarray:
        """(..., 3) translation."""
        return self.data[..., 9:12]

    @property
    def matrix(self) -> jnp.ndarray:
        """(..., 4, 4) homogeneous matrix."""
        R, t = self.R, self.t
        top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (...,3,4)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=self.data.dtype),
            top.shape[:-2] + (1, 4),
        )
        return jnp.concatenate([top, bottom], axis=-2)

    def __getitem__(self, idx) -> "Pose":
        return Pose(self.data[idx])

    def reshape(self, *shape) -> "Pose":
        return Pose(self.data.reshape(*shape, 12))

    def astype(self, dtype) -> "Pose":
        return Pose(self.data.astype(dtype))

    # -- algebra -----------------------------------------------------------
    # NOTE: all 3x3 contractions are written as explicit elementwise math.
    # Two reasons: (1) TPU default matmul precision is bf16-ish, which would
    # truncate coordinates (a 48.4459 pixel coord rounds to 48.5) — explicit
    # mul/add keeps full f32; (2) tiny matmuls over huge point tensors (the
    # ray grid is ~22M points) lower to multi-pass MXU programs, while the
    # elementwise form fuses into neighboring VPU ops.
    def inverse(self) -> "Pose":
        Rt = jnp.swapaxes(self.R, -1, -2)
        t = -_apply_R(Rt, self.t)
        return Pose.from_Rt(Rt, t)

    def compose(self, other: "Pose") -> "Pose":
        """T_B2C.compose(T_A2B) -> T_A2C (ref: utils/wrappers.py:253-257)."""
        A, B = self.R, other.R
        R = jnp.stack([
            jnp.stack([
                A[..., i, 0] * B[..., 0, j] + A[..., i, 1] * B[..., 1, j]
                + A[..., i, 2] * B[..., 2, j]
                for j in range(3)], axis=-1)
            for i in range(3)], axis=-2)
        t = self.t + _apply_R(self.R, other.t)
        return Pose.from_Rt(R, t)

    def __matmul__(self, other: "Pose") -> "Pose":
        return self.compose(other)

    def transform(self, p3d: jnp.ndarray) -> jnp.ndarray:
        """Transform points (..., N, 3). Broadcasting matches the reference:
        ``p3d @ R^T + t[..., None, :]`` (ref: utils/wrappers.py:259-267)."""
        R = self.R[..., None, :, :]  # broadcast over the points axis
        out = jnp.stack([
            p3d[..., 0] * R[..., i, 0] + p3d[..., 1] * R[..., i, 1]
            + p3d[..., 2] * R[..., i, 2]
            for i in range(3)], axis=-1)
        return out + self.t[..., None, :]

    def __mul__(self, p3d: jnp.ndarray) -> jnp.ndarray:
        return self.transform(p3d)

    def magnitude(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Rotation angle (deg) and translation norm (m)."""
        trace = jnp.trace(self.R, axis1=-2, axis2=-1)
        cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
        dr = jnp.abs(jnp.arccos(cos)) / jnp.pi * 180.0
        dt = jnp.linalg.norm(self.t, axis=-1)
        return dr, dt

    def __repr__(self):  # pragma: no cover
        return f"Pose{self.shape}"
