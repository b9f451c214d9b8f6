"""Sinusoidal 3D position embedding for query reference points.

Matches ref model/transformer_parq.py:45-64 (PETR-style pos2posemb3d):
output channel order is (y, x, z), each with interleaved sin/cos pairs.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def pos2posemb3d(pos: jnp.ndarray, num_pos_feats: int = 128,
                 temperature: float = 10000.0) -> jnp.ndarray:
    """(..., 3) in [0,1] → (..., 3*num_pos_feats)."""
    scale = 2.0 * math.pi
    pos = pos * scale
    dim_t = jnp.arange(num_pos_feats, dtype=pos.dtype)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)

    def emb(p):
        v = p[..., None] / dim_t  # (..., num_pos_feats)
        # interleave sin(v[0::2]) and cos(v[1::2]) pairwise
        s = jnp.sin(v[..., 0::2])
        c = jnp.cos(v[..., 1::2])
        return jnp.stack([s, c], axis=-1).reshape(v.shape[:-1] + (num_pos_feats,))

    return jnp.concatenate(
        [emb(pos[..., 1]), emb(pos[..., 0]), emb(pos[..., 2])], axis=-1)
