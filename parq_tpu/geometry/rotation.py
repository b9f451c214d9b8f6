"""Rotation representations: ortho6d and axis rotations.

Semantics mirror ref utils/ortho6d_transforms.py (RotationContinuity) and
utils/parq_utils.py:214-225, implemented as pure batched jnp functions.
"""
from __future__ import annotations

import jax.numpy as jnp


def rot_to_6d(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) → (..., 6): first two *columns* (ref: ortho6d_transforms.py:17-19)."""
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


def _normalize(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    mag = jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)
    return v / mag


def rotation_matrix_from_ortho6d(ortho6d: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) → (..., 3, 3) via Gram–Schmidt (ref: ortho6d_transforms.py:53-66).

    Columns of the result are (x, y, z) where x = normalize(a1),
    z = normalize(x × a2), y = z × x.
    """
    a1 = ortho6d[..., 0:3]
    a2 = ortho6d[..., 3:6]
    x = _normalize(a1)
    z = _normalize(jnp.cross(x, a2))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # columns


def roty(t) -> jnp.ndarray:
    """Rotation about y-axis; t may be batched (ref: parq_utils.py:214-218)."""
    t = jnp.asarray(t)
    c, s = jnp.cos(t), jnp.sin(t)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, zero, s], -1),
         jnp.stack([zero, one, zero], -1),
         jnp.stack([-s, zero, c], -1)], axis=-2)


def rotz(t) -> jnp.ndarray:
    t = jnp.asarray(t)
    c, s = jnp.cos(t), jnp.sin(t)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, -s, zero], -1),
         jnp.stack([s, c, zero], -1),
         jnp.stack([zero, zero, one], -1)], axis=-2)


def rotx(t) -> jnp.ndarray:
    t = jnp.asarray(t)
    c, s = jnp.cos(t), jnp.sin(t)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([one, zero, zero], -1),
         jnp.stack([zero, c, -s], -1),
         jnp.stack([zero, s, c], -1)], axis=-2)
