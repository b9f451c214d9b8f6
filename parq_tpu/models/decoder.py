"""PARQ recurrent decoder — the 8-iteration weight-shared DETR-style loop
expressed as `nn.scan` over a single layer (the TPU-natural form of the
reference's Python loop, ref: model/transformer_parq.py:283-337).

Per iteration: sinusoidal posemb of the reference points → query pos-emb MLP;
project points into every view + bilinear-sample pixel-aligned features
(the hot path, fused in Pallas when enabled); post-norm transformer decoder
layer (self-attn over 256 queries, cross-attn vs T·H·W memory tokens, FFN);
shared MLP heads regress class/center/size/ortho6d; new reference points =
stop_gradient(normalized predicted centers) (ref: :330-332).

All iteration outputs are stacked by scan (leading axis L), mirroring
`return_intermediate` (ref: :334-336).

TRAINING (batched-gradient) path: because the recurrence carry is
stop_gradient-ed (ref detaches the new reference points, :331), the L
iterations are gradient-independent given their input reference points.
The training forward therefore runs in two phases:
  1. a cheap sequential pass that only produces the reference-point
     trajectory (no gradients flow — every carry is stop_gradient-ed, so
     XLA keeps no residuals);
  2. ONE folded call with all L·Q queries in the token axis, which is the
     loss-bearing forward.
The backward of phase 2 is a single batched pass: the cross-attention
kernel reads K/V once for all L iterations (vs once per iteration), and
the dK/dV/d(memory) cotangent sums over iterations happen inside matmul
contractions instead of the scan-transpose's per-iteration select-add
chains over ~60MB tensors (the round-2 train-step profile's top cost).
Dropout draws are bit-identical between the two phases (per-iteration
keys; the flash kernel takes one seed per folded q-tile), so phase 2
recomputes exactly the forward that produced the trajectory.
"""
from __future__ import annotations

import functools
import os
import warnings
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry import Camera, Pose, inverse_sigmoid
from ..ops.posemb import pos2posemb3d
from .mlp import MLP2, HeadMLP, declare_params, fused_detection_heads

# dropout-site salts (fold_in(key_l, salt)); shared by the sequential and
# folded paths so their draws coincide
_SALT_SA_W = 0      # self-attention weight dropout
_SALT_DROP1 = 1     # residual dropout after self-attn
_SALT_CA_W = 2      # cross-attention weight dropout (flash seed / XLA mask)
_SALT_DROP2 = 3     # residual dropout after cross-attn
_SALT_FFN = 4       # dropout after the FFN ReLU
_SALT_DROP3 = 5     # residual dropout after the FFN


def normalize_points(p: jnp.ndarray, scale: Sequence[float]) -> jnp.ndarray:
    """Metric coords → [0,1]³ by the scene scale box (ref: transformer_parq.py:185-196)."""
    s = scale
    return jnp.stack([
        (p[..., 0] - s[0]) / (s[1] - s[0]),
        (p[..., 1] - s[2]) / (s[3] - s[2]),
        (p[..., 2] - s[4]) / (s[5] - s[4]),
    ], axis=-1)


def denormalize_points(p: jnp.ndarray, scale: Sequence[float]) -> jnp.ndarray:
    s = scale
    return jnp.stack([
        p[..., 0] * (s[1] - s[0]) + s[0],
        p[..., 1] * (s[3] - s[2]) + s[2],
        p[..., 2] * (s[5] - s[4]) + s[4],
    ], axis=-1)


def _grouped_keep(keys, salt: int, rate: float, per_shape, axis: int,
                  groups: int):
    """One bernoulli keep-mask per iteration group, concatenated along
    `axis`. With groups == 1 this is a single draw — the folded path's
    group-g slice equals the sequential path's iteration-g draw exactly."""
    masks = [
        jax.random.bernoulli(jax.random.fold_in(keys[g], salt), 1.0 - rate,
                             per_shape)
        for g in range(groups)
    ]
    return jnp.concatenate(masks, axis=axis) if groups > 1 else masks[0]


def _apply_drop(x: jnp.ndarray, keep: Optional[jnp.ndarray], rate: float):
    if keep is None:
        return x
    return jnp.where(keep, x / jnp.asarray(1.0 - rate, x.dtype),
                     jnp.zeros((), x.dtype))


class FlatHeadDense(nn.Module):
    """DenseGeneral((heads, head_dim))-compatible params with a FLAT
    (..., heads·head_dim) output: the head split lives in a reshape of the
    2MB kernel (folded into the matmul) instead of the output. A
    DenseGeneral-then-output-reshape is a physical relayout of the ~59MB
    K/V (H=4 pads to 8 sublanes in the (B,N,H,D) layout): 0.7ms per
    tensor per step in the op profile."""
    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    in_features: int = 0   # required for the params-only call (x is None)

    @nn.compact
    def __call__(self, x=None):
        """x=None: declare + return (kernel, bias) without computing — the
        eval path fuses the K and V projections of the SAME activation into
        one matmul (and the flash kernel reads the fused buffer directly)
        while every param stays under this module's scope, so the
        checkpoint layout and TP sharding rules are unchanged."""
        C = self.in_features if x is None else x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(in_axis=0, out_axis=(1, 2)),
            (C, self.heads, self.head_dim))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.heads, self.head_dim))
        if x is None:
            return kernel, bias
        out = self.heads * self.head_dim
        return (x @ kernel.reshape(C, out).astype(self.dtype)
                + bias.reshape(out).astype(self.dtype))


class SelfAttention(nn.Module):
    """Multi-head self-attention, parameter-compatible with flax
    nn.MultiHeadDotProductAttention (query/key/value/out DenseGenerals —
    torch-checkpoint conversion and TP sharding rules keep working), but
    with the weight-dropout keep-mask passed in EXPLICITLY so the decoder's
    sequential and folded training paths draw identical masks."""
    heads: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, keep_mask=None, rate: float = 0.0):
        head_dim = self.dim // self.heads
        proj = functools.partial(nn.DenseGeneral,
                                 features=(self.heads, head_dim),
                                 dtype=self.dtype)
        # Everything below runs HEAD-MAJOR (..., H, N, hd): with the head
        # axis as a leading batch dim both attention einsums are clean
        # batched matmuls. The (..., N, H, hd) "qhd" forms of the r3 code
        # made XLA-TPU emit the AV product as a base-dilated convolution —
        # 2.1 ms/step for a 256-token attention in the r4 step profile
        # (bench_results/r4/profile_step_top60.log) vs ~0.1 ms roofline.
        if q_in is k_in:
            # the decoder always passes q_in == k_in (tgt + query_pos):
            # run the two projections as ONE (C, 2·H·hd) matmul —
            # bit-identical (independent output columns), params stay under
            # their own scopes (checkpoint layout / TP rules unchanged).
            C, HD = q_in.shape[-1], self.heads * head_dim
            pq = declare_params(proj(name="query"), C)
            pk = declare_params(proj(name="key"), C)
            w = jnp.concatenate([pq["kernel"].reshape(C, HD),
                                 pk["kernel"].reshape(C, HD)],
                                axis=1).astype(self.dtype)
            b = jnp.concatenate([pq["bias"].reshape(HD),
                                 pk["bias"].reshape(HD)]).astype(self.dtype)
            qk = q_in.astype(self.dtype) @ w + b
            hd_shape = qk.shape[:-1] + (self.heads, head_dim)
            q = jnp.swapaxes(qk[..., :HD].reshape(hd_shape), -3, -2)
            k = jnp.swapaxes(qk[..., HD:].reshape(hd_shape), -3, -2)
        else:
            q = jnp.swapaxes(proj(name="query")(q_in), -3, -2)
            k = jnp.swapaxes(proj(name="key")(k_in), -3, -2)
        v = jnp.swapaxes(proj(name="value")(v_in), -3, -2)  # (..., H, N, hd)
        q = q / jnp.asarray(head_dim ** 0.5, q.dtype)
        w = jnp.einsum("...hqd,...hkd->...hqk", q, k)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(q.dtype)
        w = _apply_drop(w, keep_mask, rate)
        o = jnp.einsum("...hqk,...hkd->...hqd", w, v)
        # out projection contracts (H, hd) straight out of the head-major
        # layout — the head merge folds into the matmul, no relayout of o.
        out_mod = nn.DenseGeneral(self.dim, axis=(-2, -1), dtype=self.dtype,
                                  name="out")
        out_mod(jnp.zeros((1, self.heads, head_dim), jnp.float32))  # declare
        po = out_mod.variables["params"]          # kernel (H, hd, dim)
        return (jnp.einsum("...hqd,hdo->...qo", o,
                           po["kernel"].astype(self.dtype))
                + po["bias"].astype(self.dtype))


def _xla_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         rate: float, keep) -> jnp.ndarray:
    """Materializing attention: q (B,H,Q,D), k/v (B,H,N,D) → (B,H,Q,D).

    Same math as flax nn.dot_product_attention with broadcast_dropout=False
    weight-dropout semantics (== the reference's nn.MultiheadAttention
    dropout); the keep-mask is drawn by the caller."""
    D = q.shape[-1]
    w = jnp.einsum("bhqd,bhkd->bhqk", q / jnp.asarray(D ** 0.5, q.dtype), k)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(q.dtype)
    w = _apply_drop(w, keep, rate)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


class DecoderLayer(nn.Module):
    """Post-norm transformer decoder layer (ref: transformer_parq.py:340-386).

    TPU-first restructure: the cross-attention K/V projections of the
    memory tokens are hoisted OUT of the recurrence (the memory — and hence
    its K/V — is identical across all 8 iterations; the reference recomputes
    them every iteration, ~70% of forward FLOPs). This layer receives the
    precomputed (k_mem, v_mem) and owns only the query/out projections.
    The math is identical to the reference's nn.MultiheadAttention.

    `n_groups > 1` is the folded training layout: the token axis carries
    n_groups recurrence iterations × Q queries (g-major). Self-attention
    folds groups into the batch axis (no cross-iteration attention);
    dropout draws one mask per group with that group's key.
    """
    dim: int
    heads: int
    ffn_dim: int
    dropout_rate: float
    deterministic: bool
    dtype: jnp.dtype = jnp.float32
    # When True the caller guarantees: TPU backend, bf16, MXU-aligned
    # shapes, AND k_mem/v_mem arriving in the kernel's zero-copy
    # (B, N, H·D) layout with kv_valid true tokens. The gate lives in
    # PARQDecoder; no K/V relayout happens anywhere.
    use_flash: bool = False
    kv_valid: Optional[int] = None
    # k_mem IS the fused (B, N, 2·H·D) K/V buffer (v_mem ignored);
    # inference-only (PARQDecoder gates on deterministic)
    kv_fused: bool = False
    # sequence parallelism: K/V memory tokens sharded over this mesh's
    # `model` axis; attention runs the SP flash variants (partial-softmax
    # LSE merge, parallel/seq_parallel.py). Excludes kv_fused (gated in
    # PARQDecoder). None = single-device kernels.
    sp_mesh: Optional[object] = None

    @nn.compact
    def __call__(self, tgt: jnp.ndarray, k_mem: jnp.ndarray,
                 v_mem: jnp.ndarray, query_pos: jnp.ndarray,
                 drop_keys=None, n_groups: int = 1,
                 aux_out: bool = False, precomputed=None):
        """`aux_out`: also return {"attn_o", "attn_lse"} (flash path) so a
        later folded call can skip its attention forward. `precomputed`:
        that dict (stacked/folded) — the attention forward kernel is
        skipped and only the flash backward runs (gradients exact)."""
        rate = self.dropout_rate
        det = self.deterministic or rate == 0.0 or drop_keys is None
        head_dim = self.dim // self.heads
        B, GQ, _ = tgt.shape
        G = n_groups
        Q0 = GQ // G

        def drop(x, salt):
            if det:
                return x
            keep = _grouped_keep(drop_keys, salt, rate,
                                 (B, Q0) + x.shape[2:], 1, G)
            return _apply_drop(x, keep, rate)

        q_sa = tgt + query_pos
        sa_mod = SelfAttention(self.heads, self.dim, dtype=self.dtype,
                               name="self_attn")
        sa_keep = None
        if not det:
            sa_keep = _grouped_keep(drop_keys, _SALT_SA_W, rate,
                                    (B, 1, self.heads, Q0, Q0), 1, G)
            sa_keep = sa_keep.reshape(B * G, self.heads, Q0, Q0)
        if G > 1:
            q_sa_g = q_sa.reshape(B * G, Q0, -1)  # one object: q_in IS k_in
            sa = sa_mod(q_sa_g, q_sa_g,
                        tgt.reshape(B * G, Q0, -1), sa_keep, rate)
            sa = sa.reshape(B, GQ, -1)
        else:
            sa = sa_mod(q_sa, q_sa, tgt, sa_keep, rate)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            tgt + drop(sa, _SALT_DROP1))

        # cross-attention with precomputed memory K/V (projected + laid out
        # ONCE in PARQDecoder). bf16 runs the fused Pallas kernel
        # (kernels/cross_attention_pallas.py — no HBM logits), with
        # in-kernel dropout reseeded identically in fwd/bwd and one seed
        # per folded group; f32 parity runs keep the exact materializing
        # softmax.
        cq = nn.DenseGeneral((self.heads, head_dim), dtype=self.dtype,
                             name="cross_attn_query")(tgt + query_pos)
        cq_h = cq.transpose(0, 2, 1, 3)               # (B, H, GQ, D)
        aux = None
        if self.use_flash:
            from ..kernels.cross_attention_pallas import (
                flash_cross_attention, flash_cross_attention_fwd_lse,
                flash_cross_attention_kv_fused,
                flash_cross_attention_precomputed)
            seeds = None
            if not det:
                seeds = jnp.stack([
                    jax.random.randint(
                        jax.random.fold_in(drop_keys[g], _SALT_CA_W), (),
                        0, 2 ** 31 - 1, dtype=jnp.int32)
                    for g in range(G)])
            # block_k: forward-only calls (eval; the trajectory pass's
            # zero-grad fwd_lse) take big exact-divisor blocks (swept:
            # 4800 → 1.32ms vs 1.44 at 1440 for the eval shape; 2880 fits
            # VMEM with the dropout-mask tile); gradient-bearing calls
            # keep smaller blocks — the backward materializes ~5 (QT, BK)
            # f32 tiles. Mixing block sizes is safe: dropout masks are
            # block-split-invariant by construction (see _keep_mask).
            eval_bk = int(os.environ.get("PARQ_EVAL_BLOCK_K", "4800"))
            # PARQ_EVAL_QTILE: sweep knob — smaller q tiles give mosaic
            # finer MXU/VPU interleaving opportunities (QK^T of tile i+1
            # can overlap softmax of tile i); 0/unset keeps one full tile.
            eval_qt = int(os.environ.get("PARQ_EVAL_QTILE", "0")) or None
            kwargs = dict(
                n_valid=self.kv_valid,
                block_k=1440 if G > 1 else (eval_bk if det else 1440),
                q_tile=Q0 if G > 1 else (eval_qt if det else None),
                dropout_rate=0.0 if det else rate, dropout_seed=seeds)
            if self.sp_mesh is not None:
                # sequence-parallel variants: same API minus n_valid (the
                # SP path asserts all-N-valid, which kv_valid==N is here;
                # each shard masks its own block padding)
                from ..parallel.seq_parallel import (
                    sp_flash_cross_attention,
                    sp_flash_cross_attention_fwd_lse,
                    sp_flash_cross_attention_kv_fused,
                    sp_flash_cross_attention_precomputed)
                del kwargs["n_valid"]
                kwargs["mesh"] = self.sp_mesh
                flash_cross_attention = sp_flash_cross_attention
                flash_cross_attention_fwd_lse = \
                    sp_flash_cross_attention_fwd_lse
                flash_cross_attention_precomputed = \
                    sp_flash_cross_attention_precomputed
            if self.kv_fused:
                # k_mem IS the fused (B, N, H·2D) buffer here (v_mem is the
                # same array). Four sub-paths mirror the split ones below.
                from ..kernels.cross_attention_pallas import (
                    flash_cross_attention_kv_fused_fwd_lse,
                    flash_cross_attention_kv_fused_precomputed,
                    flash_cross_attention_kv_fused_train)
                kv = k_mem.astype(cq.dtype)
                if self.sp_mesh is not None:
                    assert det and precomputed is None and not aux_out
                    attn = sp_flash_cross_attention_kv_fused(
                        cq_h, kv, mesh=self.sp_mesh,
                        block_k=kwargs["block_k"])
                elif precomputed is not None:
                    attn = flash_cross_attention_kv_fused_precomputed(
                        cq_h, kv, precomputed["attn_o"].astype(cq.dtype),
                        precomputed["attn_lse"], **kwargs)
                elif aux_out:
                    attn, lse = flash_cross_attention_kv_fused_fwd_lse(
                        cq_h, kv, **{**kwargs, "block_k": 2880})
                    aux = {"attn_o": attn, "attn_lse": lse}
                elif det:
                    attn = flash_cross_attention_kv_fused(
                        cq_h, kv, block_k=kwargs["block_k"],
                        n_valid=self.kv_valid)
                else:
                    attn = flash_cross_attention_kv_fused_train(
                        cq_h, kv, **kwargs)
            elif precomputed is not None:
                attn = flash_cross_attention_precomputed(
                    cq_h, k_mem.astype(cq.dtype), v_mem.astype(cq.dtype),
                    precomputed["attn_o"].astype(cq.dtype),
                    precomputed["attn_lse"], **kwargs)
            elif aux_out:
                attn, lse = flash_cross_attention_fwd_lse(
                    cq_h, k_mem.astype(cq.dtype), v_mem.astype(cq.dtype),
                    **{**kwargs, "block_k": 2880})
                aux = {"attn_o": attn, "attn_lse": lse}
            else:
                attn = flash_cross_attention(
                    cq_h, k_mem.astype(cq.dtype), v_mem.astype(cq.dtype),
                    **kwargs)
        else:
            ca_keep = None
            if not det:
                N = k_mem.shape[2]
                ca_keep = _grouped_keep(drop_keys, _SALT_CA_W, rate,
                                        (B, self.heads, Q0, N), 2, G)
            attn = _xla_cross_attention(
                cq_h, k_mem.astype(cq.dtype), v_mem.astype(cq.dtype),
                rate, ca_keep)
        ca = nn.DenseGeneral(self.dim, axis=(-2, -1), dtype=self.dtype,
                             name="cross_attn_out")(attn.transpose(0, 2, 1, 3))
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            tgt + drop(ca, _SALT_DROP2))

        ff = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(tgt)
        ff = drop(nn.relu(ff), _SALT_FFN)
        ff = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(ff)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm3")(
            tgt + drop(ff, _SALT_DROP3))
        if aux_out:
            return tgt, aux
        return tgt


class DecoderIteration(nn.Module):
    """One recurrence step; scanned with params broadcast (weight sharing),
    or called ONCE with all L iterations folded into the query axis
    (`n_groups=L`) by the batched-gradient training path."""
    dim: int
    heads: int
    ffn_dim: int
    dropout_rate: float
    num_semcls: int
    scale: Tuple[float, ...]
    feat_size: Tuple[int, int]  # (W, H) of the feature maps
    mean_size: Tuple[Tuple[float, ...], ...]
    deterministic: bool
    use_pallas: bool = False
    use_flash: bool = False   # resolved by PARQDecoder (gate + layout prep)
    kv_valid: Optional[int] = None
    kv_fused: bool = False    # eval-only fused K/V buffer (see PARQDecoder)
    sp_mesh: Optional[object] = None  # sequence-parallel K/V (PARQDecoder)
    sampler_force: bool = False  # tests: force the fast sampler off-TPU
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ref_points, inputs, drop_keys=None,
                 n_groups: int = 1, refs_only: bool = False,
                 precomputed=None):
        memory_hw, camera, T_camera_local, k_mem, v_mem = inputs
        B, T, H, W, C = memory_hw.shape

        # query positional embedding (ref: :317-318)
        pos_feat = MLP2(self.dim, self.dim, dtype=self.dtype,
                        name="position_encoder")(pos2posemb3d(ref_points))

        # pixel-aligned sampling (ref: :321, project() :129-161).
        # Default TPU path: XLA-gather forward + Pallas matmul backward
        # (XLA's gather-transpose scatter was 2.1ms/iter in training);
        # use_pallas opts into the fully-fused forward (small-batch win).
        # Per-point math: folding L iterations into the query axis is free.
        query_metric = denormalize_points(ref_points, self.scale)
        # folded call: only group 0 (= iteration 0, the learned reference
        # points) has differentiable query coordinates — iterations ≥ 1
        # enter through stop_gradient-ed refs, so their coordinate VJP
        # is skipped (exact; d(memory) is still computed for all rows)
        diff_rows = (ref_points.shape[1] // n_groups
                     if n_groups > 1 else None)
        if precomputed is not None:
            from ..kernels.pixel_align_pallas import (
                pixel_aligned_features_precomputed)
            pix, center_im, center_valid = pixel_aligned_features_precomputed(
                memory_hw, query_metric, Pose(T_camera_local), Camera(camera),
                self.feat_size, precomputed["pix"], diff_rows=diff_rows)
        elif self.use_pallas:
            from ..kernels.pixel_align_pallas import pixel_aligned_features_pallas
            pix, center_im, center_valid = pixel_aligned_features_pallas(
                memory_hw, query_metric, Pose(T_camera_local), Camera(camera),
                self.feat_size)
        else:
            from ..kernels.pixel_align_pallas import pixel_aligned_features_fast
            pix, center_im, center_valid = pixel_aligned_features_fast(
                memory_hw, query_metric, Pose(T_camera_local), Camera(camera),
                self.feat_size, force=self.sampler_force,
                diff_rows=diff_rows)

        layer_out = DecoderLayer(self.dim, self.heads, self.ffn_dim,
                                 self.dropout_rate, self.deterministic,
                                 dtype=self.dtype, use_flash=self.use_flash,
                                 kv_valid=self.kv_valid,
                                 kv_fused=self.kv_fused,
                                 sp_mesh=self.sp_mesh,
                                 name="layer")(pix.astype(self.dtype),
                                               k_mem, v_mem,
                                               pos_feat.astype(self.dtype),
                                               drop_keys=drop_keys,
                                               n_groups=n_groups,
                                               aux_out=refs_only,
                                               precomputed=precomputed)
        if refs_only:
            out, attn_aux = layer_out
        else:
            out, attn_aux = layer_out, None

        # MLP heads (shared across iterations via params broadcast;
        # ref: parq_decoder.py:84-132, transformer_parq.py:211-281).
        # Hidden matmuls run in the compute dtype (bf16 on the fast path —
        # f32 ran them at a fraction of MXU rate); norm stats and the small
        # output projections stay f32, so every head OUTPUT is f32.
        if refs_only:
            # trajectory-only pass (phase 1 of the batched-gradient path):
            # classification/size/rotation heads don't feed the carry, so
            # only the center head runs.
            center_offset = HeadMLP((self.dim, self.dim), 3,
                                    dtype=self.dtype, name="center_head")(
                                        out, n_groups=n_groups)
        else:
            # all four heads fused into three contractions over the shared
            # tokens (bit-identical to separate applications — see
            # fused_detection_heads); per-head param scopes are unchanged,
            # so the checkpoint layout and TP sharding rules still hold.
            center_offset, cls_logits, size_scale, ortho6d = \
                fused_detection_heads(
                    out,
                    HeadMLP((self.dim, self.dim), 3, dtype=self.dtype,
                            in_features=self.dim, name="center_head")(),
                    HeadMLP((self.dim, self.dim), 6, dtype=self.dtype,
                            in_features=self.dim, name="rotation_head")(),
                    HeadMLP((), self.num_semcls + 1,
                            in_features=self.dim, name="sem_cls_head")(),
                    HeadMLP((), 3, in_features=self.dim, name="size_head")(),
                    dtype=self.dtype, n_groups=n_groups)

        coord_pos = query_metric  # matcher uses input ref points (ref: :278)
        center_norm = jax.nn.sigmoid(center_offset + inverse_sigmoid(ref_points))
        center_unnorm = denormalize_points(center_norm, self.scale)
        new_ref = jax.lax.stop_gradient(
            normalize_points(center_unnorm, self.scale))  # ref: :331-332

        if refs_only:
            # Aux carries the expensive forward products (sampled features,
            # attention output + logsumexp) so the folded call can skip
            # recomputing them.
            aux = {"pix": pix}
            if attn_aux is not None:
                aux.update(attn_aux)
            return new_ref, aux

        # cls probs under stop_gradient (ref computes them no_grad, :259-265)
        sem_cls_prob = jax.lax.stop_gradient(
            jax.nn.softmax(cls_logits, axis=-1))
        mean_size = jnp.asarray(self.mean_size, dtype=size_scale.dtype)
        pred_cls = jnp.argmax(sem_cls_prob, axis=-1)
        size_unnorm = jnp.exp(size_scale) * jnp.take(mean_size, pred_cls,
                                                     axis=0)

        outputs = {
            "pred_logits": cls_logits,
            "center_unnormalized": center_unnorm,
            "size_unnormalized": size_unnorm,
            "ortho6d": ortho6d,
            "sem_cls_prob": sem_cls_prob,
            "coord_pos": coord_pos,
            "center_im": center_im,
            "center_valid": center_valid,
        }
        return new_ref, outputs


# query axis of each decoder output (for folding/unfolding the batched path)
_QUERY_AXIS = {"center_im": 2, "center_valid": 2}


def _unfold_outputs(outputs: dict, L: int) -> dict:
    """(B, ..., L·Q, ...) folded stacks → (L, B, ..., Q, ...) scan layout."""
    def unfold(name, x):
        ax = _QUERY_AXIS.get(name, 1)
        gq = x.shape[ax]
        x = x.reshape(x.shape[:ax] + (L, gq // L) + x.shape[ax + 1:])
        return jnp.moveaxis(x, ax, 0)
    return {k: unfold(k, v) for k, v in outputs.items()}


class PARQDecoder(nn.Module):
    """Learned 3D reference points + scanned recurrent decoder.

    Returns a dict of per-iteration stacks with leading axis `num_layers`
    (the functional mirror of the reference's list of 8 dicts).
    """
    dim: int = 1024
    heads: int = 4
    ffn_dim: int = 768
    num_layers: int = 8
    dropout_rate: float = 0.1
    num_queries: int = 256
    num_semcls: int = 9
    scale: Tuple[float, ...] = (-3.0, 3.0, -2.0, 0.5, 0.25, 5.25)
    feat_size: Tuple[int, int] = (80, 60)
    mean_size: Tuple[Tuple[float, ...], ...] = ()
    share_weights: bool = True
    use_pallas: bool = False
    use_flash: bool = True
    batched_grad: bool = True
    remat: bool = False
    force_kernels: bool = False  # tests: run flash/fast-sampler off-TPU
    # sequence parallelism: shard the N memory tokens (and their K/V) over
    # this mesh's `model` axis (parallel/seq_parallel.py). Requires the
    # flash path; disables the fused-K/V eval projection (the SP merge
    # needs the separate-operand lse kernel).
    sp_mesh: Optional[object] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, memory_hw: jnp.ndarray, camera: Camera,
                 T_camera_pseudoCam: Pose, T_world_pseudoCam: Pose,
                 T_world_local: Pose, *, deterministic: bool = True):
        """memory_hw: (B, T, H, W, C) tokenized features (image + rayPE).
        camera: Camera (B, T) at feature scale. Poses as in the reference
        (ref: parq_decoder.py:134-163)."""
        B = memory_hw.shape[0]
        L = self.num_layers

        # T_camera_local = T_camera_pseudoCam @ (T_world_pseudoCam⁻¹ @ T_world_local)
        # (ref: transformer_parq.py:298-300)
        Tl = T_world_local
        if Tl.data.ndim == 2:
            Tl = Pose(Tl.data[:, None, :])
        T_camera_local = T_camera_pseudoCam @ (T_world_pseudoCam.inverse() @ Tl)

        refpoint = self.param(
            "refpoint", nn.initializers.normal(1.0),
            (self.num_queries, 3))
        ref_points = jax.nn.sigmoid(refpoint)  # (Q, 3), ref: :309
        ref_points = jnp.broadcast_to(ref_points[None], (B,) + ref_points.shape)

        mean_size = self.mean_size or tuple(
            tuple(r) for r in [[1.0] * 3] * (self.num_semcls + 1))

        # memory K/V projected ONCE (identical across iterations; the
        # reference recomputes them per iteration — transformer_parq.py:377).
        # The fused kernel consumes K/V in the projection's NATURAL
        # (B, N, H·D) layout — the reshape is free, so the ~59MB K/V never
        # get relaid out at all (the earlier pre-transposed+padded layout
        # cost 2.2ms/step of pads and layout copies).
        Bm, Tm, Hm, Wm, Cm = memory_hw.shape
        N = Tm * Hm * Wm
        memory_tokens = memory_hw.reshape(Bm, N, Cm).astype(self.dtype)
        head_dim = self.dim // self.heads

        # static gate for the fused cross-attention kernel (bf16 TPU path,
        # inference AND training — the kernel has a flash-style custom VJP
        # with in-kernel dropout; f32 keeps the exact XLA softmax for
        # checkpoint-parity runs)
        on_fast_path = (self.force_kernels
                        or (jax.default_backend() == "tpu"
                            and self.dtype == jnp.bfloat16))
        flash = (self.use_flash and on_fast_path
                 and head_dim % 128 == 0 and self.num_queries % 8 == 0)
        # fused matmul sampler: same bf16-TPU gate (f32 parity runs keep
        # the exact XLA gather path)
        pallas_sampler = self.use_pallas and on_fast_path
        sp_mesh = self.sp_mesh if flash else None
        if self.sp_mesh is not None and not flash:
            # config requested SP but the runtime flash gate (TPU backend +
            # bf16 + shape divisibility) failed: K/V will be fully
            # replicated on every device — say so instead of silently
            # ignoring the knob (check_config catches the static cases).
            warnings.warn(
                "TPU.SEQ_PARALLEL requested but the flash-attention gate "
                f"is off (backend={jax.default_backend()}, dtype="
                f"{self.dtype}); running UNSHARDED with replicated K/V")
        if sp_mesh is not None:
            # place the token axis shard-local BEFORE the K/V projections
            # so XLA computes them without gathering the 59MB K/V; the SP
            # attention then consumes the shards in place
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import MODEL_AXIS
            memory_tokens = jax.lax.with_sharding_constraint(
                memory_tokens,
                NamedSharding(sp_mesh, P(None, MODEL_AXIS, None)))
        # Project K and V in ONE (C, 2·H·D) matmul — the token activation
        # is read once, ONE weight-grad pass runs over the 236MB memory in
        # the backward, and the flash kernel consumes the fused buffer via
        # lane-offset blocks (no slice ever materializes). Training uses
        # the differentiable fused twins whose backward kernel hands dKV
        # back in the SAME fused layout (r4; the r3 code kept separate
        # train projections because a dKV assembly outside the kernel
        # would have cost ~1.2ms — the in-kernel fused store costs zero).
        # Under SP the fused buffer shards on its token axis; the SP
        # TRAIN path keeps separate projections (its flash variants merge
        # per-shard partials and have no fused-train twin).
        kv_fused = flash and (deterministic or sp_mesh is None)
        k_proj = FlatHeadDense(self.heads, head_dim, dtype=self.dtype,
                               in_features=Cm, name="cross_attn_key")
        v_proj = FlatHeadDense(self.heads, head_dim, dtype=self.dtype,
                               in_features=Cm, name="cross_attn_value")
        if kv_fused:
            wk, bk = k_proj()   # (C, H, D) / (H, D)
            wv, bv = v_proj()
            # head-INTERLEAVED columns [K_h | V_h]: the flash kernel then
            # fetches a head's K and V in ONE (BK, 2D) block DMA
            w_kv = jnp.stack([wk, wv], axis=2).reshape(
                Cm, self.heads * 2 * head_dim)
            b_kv = jnp.stack([bk, bv], axis=1).reshape(
                self.heads * 2 * head_dim)
            k_mem = v_mem = (memory_tokens @ w_kv.astype(self.dtype)
                             + b_kv.astype(self.dtype))
        else:
            k_mem = k_proj(memory_tokens)
            v_mem = v_proj(memory_tokens)
        kv_valid = None
        if flash:
            kv_valid = N                          # already (B, N, H·D)
        else:
            k_mem = k_mem.reshape(Bm, N, self.heads, head_dim) \
                .transpose(0, 2, 1, 3)            # (B, H, N, D)
            v_mem = v_mem.reshape(Bm, N, self.heads, head_dim) \
                .transpose(0, 2, 1, 3)

        iter_kwargs = dict(
            dim=self.dim, heads=self.heads, ffn_dim=self.ffn_dim,
            dropout_rate=self.dropout_rate, num_semcls=self.num_semcls,
            scale=tuple(self.scale), feat_size=tuple(self.feat_size),
            mean_size=mean_size, deterministic=deterministic,
            use_pallas=pallas_sampler, use_flash=flash, kv_valid=kv_valid,
            kv_fused=kv_fused, sp_mesh=sp_mesh,
            sampler_force=self.force_kernels, dtype=self.dtype)

        inputs = (memory_hw, camera.data, T_camera_local.data, k_mem, v_mem)

        need_keys = (not deterministic) and self.dropout_rate > 0.0
        if need_keys:
            keys = jax.random.split(self.make_rng("dropout"), L)
        else:
            keys = jnp.zeros((L, 2), jnp.uint32)  # ignored (det gate)
        use_keys = need_keys  # static

        batched = (self.batched_grad and not deterministic
                   and self.share_weights and not self.remat and L > 1
                   # only worthwhile with the flash kernel: its
                   # precomputed-forward VJP is what lets phase 2 skip the
                   # attention recompute. On non-kernel configs (f32
                   # parity, CPU) phase 1 + phase 2 would run the full XLA
                   # attention forward twice with no folded-backward win.
                   and flash)
        if batched:
            # Phase 1: sequential trajectory pass over ALL L iterations.
            # new_ref is stop_gradient-ed inside the iteration, so nothing
            # here is differentiated; besides the reference-point
            # trajectory it collects each iteration's expensive forward
            # products (sampled features; flash attention output +
            # logsumexp), which the folded call reuses instead of
            # recomputing — its backward reconstructs everything it needs
            # from (q, k, v, lse) alone.
            it = DecoderIteration(name="iteration", **iter_kwargs)
            refs = [ref_points]
            # phase 1 is entirely outside the differentiation path: its
            # trajectory/aux outputs are consumed through stop_gradient, and
            # severing the INPUTS too keeps JAX from tracing tangents into
            # the forward-only kernels (which have no JVP rules). Phase 2
            # owns every gradient, including iteration 0's refpoint.
            inputs_sg = jax.lax.stop_gradient(inputs)
            r = jax.lax.stop_gradient(ref_points)
            auxes = []
            for l in range(L):
                r, aux = it(r, inputs_sg,
                            keys[l:l + 1] if use_keys else None,
                            refs_only=True)
                auxes.append(aux)
                if l < L - 1:
                    refs.append(r)
            ref_all = jnp.concatenate(refs, axis=1)   # (B, L·Q, 3) g-major
            # fold the aux along the query axis (g-major, like ref_all) and
            # sever it from the graph: its dependence on params/memory is
            # accounted for by the precomputed-forward custom VJPs.
            fold_axis = {"pix": 1, "attn_o": 2, "attn_lse": 2}
            pre = {k: jax.lax.stop_gradient(
                jnp.concatenate([a[k] for a in auxes], axis=fold_axis[k]))
                for k in auxes[0]}

            # Phase 2: ONE folded call — the loss-bearing forward, whose
            # backward is batched over all L iterations.
            _, outputs = it(ref_all, inputs, keys if use_keys else None,
                            n_groups=L, precomputed=pre)
            return _unfold_outputs(outputs, L)

        IterCls = nn.remat(DecoderIteration) if self.remat \
            else DecoderIteration
        if self.share_weights:
            # unroll default 1: full unroll (8) was A/B'd on-chip in r4
            # against the ~2ms loop/dispatch overhead and LOST, 930.3 vs
            # 941.7 fps (bench_results/r4/eval_unroll.log) — XLA's
            # while-loop body reuses its compiled schedule; inlining 8
            # bodies only grew the program. PARQ_SCAN_UNROLL sweeps the
            # partial unrolls (2/4) the r4 A/B never tried.
            ScanIter = nn.scan(
                IterCls,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=(nn.broadcast, 0),
                out_axes=0,
                length=L,
                unroll=int(os.environ.get("PARQ_SCAN_UNROLL", "1")),
            )
            _, outputs = ScanIter(name="iteration", **iter_kwargs)(
                ref_points, inputs, keys[:, None] if use_keys else None)
        else:
            outs = []
            for i in range(L):
                ref_points, o = IterCls(
                    name=f"iteration_{i}", **iter_kwargs)(
                    ref_points, inputs,
                    keys[i:i + 1] if use_keys else None)
                outs.append(o)
            outputs = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs, 0), *outs)
        return outputs
