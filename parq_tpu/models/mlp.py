"""MLP building blocks for the detection heads.

Reproduces the reference's GenericMLP-with-conv1x1 semantics
(ref: model/generic_mlp.py:64-132): a 1x1 Conv1d over (B, C, N) is a Linear
over tokens, and the "ln" norm is GroupNorm(num_groups=1) — which normalizes
over channels AND tokens jointly per sample (NOT per-token LayerNorm). That
quirk matters for checkpoint parity, so `GroupNorm1` mirrors it exactly.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class GroupNorm1(nn.Module):
    """torch GroupNorm(1, C) over (B, N, C) inputs: normalize over (N, C)
    jointly, per-channel affine. eps matches torch default."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, n_groups: int = 1) -> jnp.ndarray:
        """`n_groups > 1`: the token axis (axis 1) folds n_groups recurrence
        iterations (decoder batched-grad path); the (N, C) statistics are
        computed PER GROUP so the folded call matches per-iteration calls."""
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        in_dtype = x.dtype
        # statistics always in f32 (exact on the f32 parity path; on the
        # bf16 fast path only the surrounding matmuls drop precision)
        x = x.astype(jnp.float32)
        if n_groups > 1:
            shp = x.shape
            x = x.reshape((shp[0], n_groups, shp[1] // n_groups) + shp[2:])
        red = tuple(range(2 if n_groups > 1 else 1, x.ndim))
        mean = jnp.mean(x, axis=red, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=red, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        y = y * scale + bias
        if n_groups > 1:
            y = y.reshape(shp)
        return y.astype(in_dtype)


class HeadMLP(nn.Module):
    """Detection-head MLP over (B, N, C) tokens.

    hidden layers: Linear(no bias) → GroupNorm1 → ReLU → [Dropout];
    output: Linear(bias). Mirrors ref model/parq_decoder.py:84-132 configs:
    big heads (center/rotation) use hidden=[D, D], dropout 0; small heads
    (semcls/size) have no hidden layers at all (dropout list is empty).
    """
    hidden_dims: Sequence[int]
    output_dim: int
    dropout: float = 0.0
    # compute dtype of the big hidden matmuls (the [D, D] hiddens of the
    # center/rotation heads are 2×68 GFLOP/step at release shapes — f32
    # runs them at a fraction of MXU bf16 rate). Norm statistics stay f32
    # (GroupNorm1) and the small output projection always computes/returns
    # f32 — heads feed sigmoid/loss math.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True,
                 n_groups: int = 1) -> jnp.ndarray:
        for h in self.hidden_dims:
            x = nn.Dense(h, use_bias=False, dtype=self.dtype)(x)
            x = GroupNorm1(h)(x, n_groups=n_groups)
            x = nn.relu(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.output_dim, use_bias=True,
                        dtype=jnp.float32)(x)


class MLP2(nn.Module):
    """Linear → ReLU → Linear (used by RayPE encoder and the query position
    encoder, ref: ray_positional_encoding.py:55-59, transformer_parq.py:176-180)."""
    hidden_dim: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.output_dim, dtype=self.dtype)(x)
