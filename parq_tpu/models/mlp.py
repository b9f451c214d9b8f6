"""MLP building blocks for the detection heads.

Reproduces the reference's GenericMLP-with-conv1x1 semantics
(ref: model/generic_mlp.py:64-132): a 1x1 Conv1d over (B, C, N) is a Linear
over tokens, and the "ln" norm is GroupNorm(num_groups=1) — which normalizes
over channels AND tokens jointly per sample (NOT per-token LayerNorm). That
quirk matters for checkpoint parity, so `GroupNorm1` mirrors it exactly.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def declare_params(module: nn.Module, in_features: int):
    """Declare a Dense/DenseGeneral submodule's params WITHOUT using its
    output (dummy (1, in_features) zeros call — XLA DCEs the matmul) and
    return the param dict. The fused compute paths read per-module weights
    this way so every param keeps its own scope: checkpoint layout and TP
    sharding rules are unchanged. The module must carry an explicit `name`
    that replicates flax's auto-numbering for the normal compute path."""
    module(jnp.zeros((1, in_features), jnp.float32))
    return module.variables["params"]


class GroupNorm1(nn.Module):
    """torch GroupNorm(1, C) over (B, N, C) inputs: normalize over (N, C)
    jointly, per-channel affine. eps matches torch default."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray = None, n_groups: int = 1):
        """`n_groups > 1`: the token axis (axis 1) folds n_groups recurrence
        iterations (decoder batched-grad path); the (N, C) statistics are
        computed PER GROUP so the folded call matches per-iteration calls.

        `x=None`: declare + return (scale, bias) without computing (the
        fused-head path applies the normalization itself)."""
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if x is None:
            return scale, bias
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
    in_features: int = 0  # required for the params-only call (x is None)

    @nn.compact
    def __call__(self, x: jnp.ndarray = None, *, deterministic: bool = True,
                 n_groups: int = 1):
        """`x=None`: declare + return the layer params WITHOUT computing —
        `(hidden, final)` where `hidden` is a list of
        `(kernel, gn_scale, gn_bias)` per hidden block and `final` is
        `(kernel, bias)`. The fused-head path (`fused_detection_heads`)
        consumes these to run several heads in shared contractions while
        every param keeps its per-head scope (checkpoint layout unchanged).
        Explicit submodule names replicate flax's auto-numbering, so both
        call modes address the identical parameter tree."""
        if x is None:
            assert self.in_features > 0, "params-only call needs in_features"
            c, hidden = self.in_features, []
            for i, h in enumerate(self.hidden_dims):
                d = declare_params(
                    nn.Dense(h, use_bias=False, dtype=self.dtype,
                             name=f"Dense_{i}"), c)
                gs, gb = GroupNorm1(h, name=f"GroupNorm1_{i}")(None)
                hidden.append((d["kernel"], gs, gb))
                c = h
            p = declare_params(
                nn.Dense(self.output_dim, use_bias=True, dtype=jnp.float32,
                         name=f"Dense_{len(self.hidden_dims)}"), c)
            return hidden, (p["kernel"], p["bias"])
        for h in self.hidden_dims:
            x = nn.Dense(h, use_bias=False, dtype=self.dtype)(x)
            x = GroupNorm1(h)(x, n_groups=n_groups)
            x = nn.relu(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.output_dim, use_bias=True,
                        dtype=jnp.float32)(x)


def _gn_pair(h: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
             n_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm1 over (B, N, K, D) with independent statistics per
    (sample, group, head-slot k) — the stacked form of K separate
    GroupNorm1(D) calls (bit-identical: stats reduce over the same
    (N/groups, D) elements in f32). scale/bias: (K, D)."""
    in_dtype = h.dtype
    x = h.astype(jnp.float32)
    B, N, K, D = x.shape
    x = x.reshape(B, n_groups, N // n_groups, K, D)
    mean = jnp.mean(x, axis=(2, 4), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(2, 4), keepdims=True)
    y = (x - mean) / jnp.sqrt(var + eps)
    y = y * scale + bias
    return y.reshape(B, N, K, D).astype(in_dtype)


def fused_detection_heads(x: jnp.ndarray, center, rotation, semcls, size,
                          *, dtype, n_groups: int = 1):
    """Run the four detection heads in THREE contractions instead of eight
    (ref applies four separate GenericMLPs per iteration,
    model/parq_decoder.py:84-132 + transformer_parq.py:211-281; at release
    shapes the heads are part of a ~45ms tail of sub-1ms fusions in the
    train step). Inputs are the params-only outputs of the four `HeadMLP`s
    (center/rotation: hidden=[D, D]; semcls/size: no hiddens).

    Bit-identical to the four separate `HeadMLP` applications:
      - concatenated-kernel matmuls: output columns are independent dots;
      - block-diagonal second/final layers: the off-diagonal zero blocks
        contribute exact +0.0 terms to each accumulation;
      - `_gn_pair` keeps per-head statistics separate.
    Layout-free: the trunk stays (B, N, 2·D) end to end — the only
    reshapes split/merge the minor-most axis (bitcasts under XLA).

    Returns (center_offset3, cls_logits, size_scale3, ortho6d) — all f32
    (final projections compute in f32, matching HeadMLP's output Dense).
    """
    c_hid, (wc_out, bc_out) = center
    r_hid, (wr_out, br_out) = rotation
    _, (w_cls, b_cls) = semcls
    _, (w_sz, b_sz) = size
    B, N, C = x.shape
    D = c_hid[0][0].shape[1]
    S = w_cls.shape[1]

    # small heads (no hiddens): one f32 matmul over the shared tokens
    w_small = jnp.concatenate([w_cls, w_sz], axis=1)
    b_small = jnp.concatenate([b_cls, b_sz])
    small = x.astype(jnp.float32) @ w_small + b_small
    cls_logits, size_scale = small[..., :S], small[..., S:]

    # big-head trunk, layer 1: (C, 2D) fused kernel
    w1 = jnp.concatenate([c_hid[0][0], r_hid[0][0]], axis=1).astype(dtype)
    h = (x.astype(dtype) @ w1).reshape(B, N, 2, D)
    h = nn.relu(_gn_pair(h, jnp.stack([c_hid[0][1], r_hid[0][1]]),
                         jnp.stack([c_hid[0][2], r_hid[0][2]]), n_groups))

    # layer 2. Three candidate forms, all the same math:
    #   blockdiag — (2D, 2D) with zero off-blocks (r4 default); the r5
    #     eval profile shows XLA REWRITES this into a 1x2-window
    #     convolution (it detects the block structure) that lowers ~8x
    #     off roofline (convert_reduce_fusion.20: 0.73 ms/call vs ~0.09
    #     dense roofline);
    #   batched — k-batched dot_general over the head-slot axis: true
    #     FLOPs (no zero blocks), no conv rewrite, keeps (B, N, 2, D)
    #     (the layer-1 reshape output) with no extra copies;
    #   [two-lane-slice matmuls + stack: LOST r4 255.3 vs 258.7 train —
    #     the stack copy; the batched form has no such copy.]
    # The zero-block terms add exact +0.0 to every f32 accumulator, but
    # partial-sum grouping differs between forms → ≤1e-7-rel deltas.
    # r5 on-chip A/B: batched WON train 279.59 vs 273.26 (the conv
    # rewrite hurt fwd+bwd across all 8 folded iterations) and was
    # neutral-positive on eval (958.6 vs 957.0) — default since r5.
    if os.environ.get("PARQ_HEADS_L2", "batched") == "batched":
        w2b = jnp.stack([c_hid[1][0], r_hid[1][0]]).astype(dtype)  # (2,D,D)
        h = jnp.einsum("bnkd,kde->bnke", h, w2b)          # (B,N,2,D)
    else:
        zc = jnp.zeros_like(c_hid[1][0])
        w2 = jnp.concatenate(
            [jnp.concatenate([c_hid[1][0], zc], axis=1),
             jnp.concatenate([jnp.zeros_like(r_hid[1][0]), r_hid[1][0]],
                             axis=1)], axis=0).astype(dtype)
        h = (h.reshape(B, N, 2 * D) @ w2).reshape(B, N, 2, D)
    h = nn.relu(_gn_pair(h, jnp.stack([c_hid[1][1], r_hid[1][1]]),
                         jnp.stack([c_hid[1][2], r_hid[1][2]]), n_groups))

    # final projections: block-diagonal (2D, 3+6), f32
    w_out = jnp.concatenate(
        [jnp.concatenate([wc_out, jnp.zeros((D, 6), wc_out.dtype)], axis=1),
         jnp.concatenate([jnp.zeros((D, 3), wr_out.dtype), wr_out],
                         axis=1)], axis=0)
    b_out = jnp.concatenate([bc_out, br_out])
    y = h.reshape(B, N, 2 * D).astype(jnp.float32) @ w_out + b_out
    return y[..., :3], cls_logits, size_scale, y[..., 3:]


class MLP2(nn.Module):
    """Linear → ReLU → Linear (used by RayPE encoder and the query position
    encoder, ref: ray_positional_encoding.py:55-59, transformer_parq.py:176-180).

    `in_perm`: static permutation of the INPUT features, folded into the
    first kernel: for a caller feeding x[..., perm] instead of x, gathering
    the kernel ROWS with the SAME perm restores the original product —
    x[..., perm] @ W[perm, :] == x @ W (each row of W meets its own input
    feature exactly once; note x[..., perm] @ W == x @ W[inv_perm], NOT
    W[perm], so don't "simplify" the take) — so callers that
    produce their features in a TPU-friendlier order than the checkpoint's
    weight convention (rayPE's channel-major ray samples) stay
    checkpoint-compatible for free. The param tree is unchanged.
    """
    hidden_dim: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32
    in_perm: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.in_perm is None:
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="Dense_0")(x)
        else:
            p = declare_params(
                nn.Dense(self.hidden_dim, dtype=self.dtype, name="Dense_0"),
                len(self.in_perm))
            w = jnp.take(p["kernel"], jnp.asarray(self.in_perm), axis=0)
            x = (x.astype(self.dtype) @ w.astype(self.dtype)
                 + p["bias"].astype(self.dtype))
        x = nn.relu(x)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="Dense_1")(x)
