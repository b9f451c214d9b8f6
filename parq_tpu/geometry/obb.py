"""Oriented 3D bounding boxes as flat (..., 19) array pytrees.

Layout (ref: utils/wrappers.py:297-436):
  ``[bb3_object (6: xmin,xmax,ymin,ymax,zmin,zmax), T_world_object (12), sem_id (1)]``

Padding is a first-class invariant: a pad box is all ``-1`` and every batch
carries a fixed ``MAX_BOXES`` (default 100) so shapes stay static under jit.
Instead of the reference's ``remove_padding`` (dynamic shapes), downstream
code uses :meth:`valid_mask` and masked ops.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .pose import Pose

MAX_BOXES = 100  # ref: utils/wrappers.py:395 default
MAX_SYMS = 50    # ref: datasets/scannet_dataset.py:161

# Corner ordering identical to ref utils/wrappers.py:357-393.
_CORNER_SIGNS = np.array(
    [
        [0, 0, 0],
        [1, 0, 0],
        [1, 1, 0],
        [0, 1, 0],
        [0, 0, 1],
        [1, 0, 1],
        [1, 1, 1],
        [0, 1, 1],
    ],
    dtype=np.int32,
)  # index into (min, max) per axis


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Obb3D:
    data: jnp.ndarray  # (..., 19)

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @classmethod
    def from_parts(cls, bb3_object: jnp.ndarray, T_world_object: jnp.ndarray,
                   sem_id: jnp.ndarray) -> "Obb3D":
        """bb3_object (...,6); T_world_object (...,12) flat pose; sem_id (...,) or (...,1)."""
        if sem_id.ndim != bb3_object.ndim:
            sem_id = sem_id[..., None]
        return cls(jnp.concatenate(
            [bb3_object, T_world_object, sem_id.astype(bb3_object.dtype)], axis=-1))

    @property
    def shape(self):
        return self.data.shape[:-1]

    def __getitem__(self, idx) -> "Obb3D":
        return Obb3D(self.data[idx])

    @property
    def bb3_object(self) -> jnp.ndarray:
        return self.data[..., :6]

    @property
    def bb3_min_object(self) -> jnp.ndarray:
        return self.data[..., 0:6:2]

    @property
    def bb3_max_object(self) -> jnp.ndarray:
        return self.data[..., 1:6:2]

    @property
    def bb3_center_object(self) -> jnp.ndarray:
        return 0.5 * (self.bb3_min_object + self.bb3_max_object)

    @property
    def bb3_size(self) -> jnp.ndarray:
        return self.bb3_max_object - self.bb3_min_object

    @property
    def T_world_object(self) -> Pose:
        return Pose(self.data[..., 6:18])

    @property
    def sem_id(self) -> jnp.ndarray:
        """(..., 1) float semantic id (−1 for pad)."""
        return self.data[..., 18:19]

    @property
    def corners_object(self) -> jnp.ndarray:
        """8 corners in object frame, (..., 8, 3), reference ordering."""
        lo = self.bb3_min_object[..., None, :]  # (...,1,3)
        hi = self.bb3_max_object[..., None, :]
        signs = jnp.asarray(_CORNER_SIGNS, dtype=self.data.dtype)  # (8,3)
        return lo + (hi - lo) * signs

    def valid_mask(self) -> jnp.ndarray:
        """(...,) bool — True for real boxes, False for all −1 pad rows."""
        return ~jnp.all(self.data == -1.0, axis=-1)

    def pad_to(self, max_box: int = MAX_BOXES) -> "Obb3D":
        """Pad (or truncate) leading box axis to a static size with −1 rows."""
        n = self.data.shape[-2]
        if n >= max_box:
            return Obb3D(self.data[..., :max_box, :])
        pad_shape = self.data.shape[:-2] + (max_box - n, 19)
        pad = -jnp.ones(pad_shape, dtype=self.data.dtype)
        return Obb3D(jnp.concatenate([self.data, pad], axis=-2))

    def __repr__(self):  # pragma: no cover
        return f"Obb3D{self.shape}"


def pad_obbs_np(bb3: np.ndarray, T_world_object: np.ndarray, sem_id: np.ndarray,
                max_box: int = MAX_BOXES) -> np.ndarray:
    """Host-side (numpy) builder used by the data pipeline: returns (max_box, 19)."""
    n = bb3.shape[0]
    data = np.concatenate(
        [bb3.reshape(n, 6), T_world_object.reshape(n, 12),
         sem_id.reshape(n, 1).astype(bb3.dtype)], axis=-1)
    if n >= max_box:
        return data[:max_box]
    pad = -np.ones((max_box - n, 19), dtype=data.dtype)
    return np.concatenate([data, pad], axis=0)
