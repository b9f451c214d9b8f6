"""Fused pixel-aligned sampling as a Pallas TPU kernel.

The decoder hot path projects Q query points into every view and bilinearly
samples C-dim features (ref: model/transformer_parq.py:129-161, F.grid_sample).
A gather is the GPU idiom; the TPU-native formulation is a **sparse-weight
matmul**: sampling is `W @ M` where `M` is the (H·W, C) feature map and `W`
is a (Q, H·W) matrix with ≤4 bilinear weights per row. This kernel builds
each W tile on the fly in VMEM from the projected coordinates (VPU compares
against position iotas — out-of-bounds neighbors simply never match, giving
`padding_mode='zeros'` for free) and contracts it with the feature tile on
the MXU, accumulating over views with the valid-count mean folded into the
weights. The (Q, H·W) matrix never exists in HBM.

Backward uses the XLA reference implementation's VJP (exact same math), so
training is unaffected by kernel details.

Grid: (B, T, H/RT row-tiles); the output block (Q, C) is revisited across
(t, row-tile) steps and accumulated in place.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import Camera, Pose
from ..ops.pixel_align import pixel_aligned_features as _xla_reference


def _pick_row_tile(H: int, W: int, C: int, Q: int, itemsize: int) -> int:
    """Largest divisor row-tile fitting the ~16MB v5e VMEM budget with
    double-buffered input blocks + the (Q, C) f32 accumulator + weight
    intermediates. PARQ_SAMPLER_RT overrides (r5 sweep knob: bigger tiles
    = fewer grid steps / less per-step W-build overhead, tighter VMEM)."""
    import os
    rt_env = int(os.environ.get("PARQ_SAMPLER_RT", "0"))
    if rt_env > 0 and H % rt_env == 0:
        return rt_env
    # 14MB: raised from 12MB in r5 — at release dims the larger budget
    # admits rt=30 (est. 13.4MB), which WON its on-chip A/B 965.5 vs
    # 957.0 eval fps (fewer grid steps, less per-step W-build overhead);
    # rt=10 lost (927.7). The estimate stays ≥1.5MB under the 16MB
    # hardware VMEM.
    budget = 14 * 1024 * 1024
    for rt in (30, 20, 15, 12, 10, 8, 6, 5, 4, 3, 2, 1):
        if H % rt:
            continue
        mem_bytes = 2 * rt * W * C * itemsize          # double-buffered in
        w_bytes = (rt + 2) * Q * W * 4                 # w tile + wx factor
        out_bytes = Q * C * 4
        if mem_bytes + w_bytes + out_bytes <= budget:
            return rt
    return 1


def _build_w_tile(uvs, row0, RT: int, W_img: int) -> jnp.ndarray:
    """Bilinear sampling weights for one row-tile as a dense (Q, RT·W)
    matrix. The matrix is separable — w[q, (r, x)] = wy[q, r] · wx[q, x] —
    so each image-row block is the (Q, W) wx factor scaled by that row's
    wy column, laid side by side with a lane concat: pure VPU O(Q·P), no
    MXU indicator expansion (an earlier version spent ~2ms/step on
    HIGHEST-precision expander matmuls), and exact (no matmul rounding).
    Out-of-bounds neighbors never match any position → zeros padding for
    free. The per-query `scale` (valid-mean fold-in) rides on wy."""
    u = uvs[:, 0:1]                            # (Q, 1)
    v = uvs[:, 1:2]
    scale = uvs[:, 2:3]                        # valid/count fold-in

    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = u - x0
    fy = v - y0

    Q = u.shape[0]

    zero = jnp.float32(0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Q, W_img), 1).astype(
        jnp.float32)
    wx = (jnp.where(col == x0, 1.0 - fx, zero)
          + jnp.where(col == x0 + 1.0, fx, zero))          # (Q, W)
    wy0 = (1.0 - fy) * scale                               # (Q, 1)
    wy1 = fy * scale

    parts = []
    for r in range(RT):
        rowf = jnp.float32(row0 + r) if isinstance(row0, int) \
            else (row0 + r).astype(jnp.float32)
        wy_r = (jnp.where(y0 == rowf, wy0, zero)
                + jnp.where(y0 + 1.0 == rowf, wy1, zero))  # (Q, 1)
        parts.append(wx * wy_r)
    return jnp.concatenate(parts, axis=1)                  # (Q, RT·W)


def _build_w_tile_t(uvs_t, row0, RT: int, W_img: int) -> jnp.ndarray:
    """TRANSPOSED W tile (RT·W, Q) — same values as
    `_build_w_tile(...).T`, built with the row blocks stacked on
    SUBLANES. W_img=80 is 8-sublane-aligned, so the RT block stores need
    no lane rotations; the original (Q, RT·W) form concatenates
    80-LANE blocks (80 % 128 != 0), which mosaic must realize with a
    misaligned-lane shift per block — measured ~1.1 ms/call of sampler
    residual over the MXU+DMA roofline at release dims. `uvs_t` arrives
    pre-transposed (4, Q) so the per-query vectors are lane rows (an
    in-kernel (Q,1)→(1,Q) transpose would itself relayout)."""
    u = uvs_t[0:1, :]                          # (1, Q)
    v = uvs_t[1:2, :]
    scale = uvs_t[2:3, :]

    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = u - x0
    fy = v - y0

    Q = u.shape[1]
    zero = jnp.float32(0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (W_img, Q), 0).astype(
        jnp.float32)
    wx = (jnp.where(col == x0, 1.0 - fx, zero)
          + jnp.where(col == x0 + 1.0, fx, zero))          # (W, Q)
    wy0 = (1.0 - fy) * scale                               # (1, Q)
    wy1 = fy * scale

    parts = []
    for r in range(RT):
        rowf = jnp.float32(row0 + r) if isinstance(row0, int) \
            else (row0 + r).astype(jnp.float32)
        wy_r = (jnp.where(y0 == rowf, wy0, zero)
                + jnp.where(y0 + 1.0 == rowf, wy1, zero))  # (1, Q)
        parts.append(wx * wy_r)
    return jnp.concatenate(parts, axis=0)                  # (RT·W, Q)


def _sample_kernel(uvs_ref, mem_ref, out_ref, *, W_img: int, RT: int,
                   wt: bool = False):
    """uvs: (1, 1, Q, 4) [u, v, scale, _] — or (1, 1, 4, Q) when `wt`;
    mem: (1, 1, RT, W, C); out: (1, Q, C) accumulated over grid steps
    (t, row-tile)."""
    t = pl.program_id(1)
    r = pl.program_id(2)

    @pl.when((t == 0) & (r == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # dtype-matched MXU: bf16 memory → fast bf16 matmul (f32 accumulate);
    # f32 memory → full-precision passes to preserve checkpoint parity.
    # memory arrives pre-flattened (1, 1, P, C): no in-kernel relayout.
    mem = mem_ref[0, 0]                                     # (P, C)
    precision = (jax.lax.Precision.HIGHEST
                 if mem.dtype == jnp.float32 else None)
    if wt:
        w_tile_t = _build_w_tile_t(uvs_ref[0, 0], r * RT, RT, W_img)
        contrib = jax.lax.dot_general(
            w_tile_t.astype(mem.dtype), mem, (((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)             # (Q, C)
    else:
        w_tile = _build_w_tile(uvs_ref[0, 0], r * RT, RT, W_img)
        contrib = jnp.dot(w_tile.astype(mem.dtype), mem,
                          precision=precision,
                          preferred_element_type=jnp.float32)  # (Q, C)
    out_ref[0] += contrib.astype(out_ref.dtype)


def _pallas_sample(memory_hw: jnp.ndarray, uvs: jnp.ndarray) -> jnp.ndarray:
    """memory_hw: (B, T, H, W, C); uvs: (B, T, Q, 4) → (B, Q, C)."""
    B, T, H, W, C = memory_hw.shape
    Q = uvs.shape[2]
    RT = _pick_row_tile(H, W, C, Q, memory_hw.dtype.itemsize)
    grid = (B, T, H // RT)

    # transposed (sublane-stacked) W build — see _build_w_tile_t; needs
    # W % 8 == 0 for the aligned stores it exists to provide. Default ON
    # since its r5 A/B: 1021.5 vs 984.8 eval fps (+37 ≈ 0.91 ms/step —
    # the misaligned lane concats were the sampler's entire residual over
    # the MXU+DMA roofline). PARQ_SAMPLER_WT=0 restores the lane form.
    import os
    wt = os.environ.get("PARQ_SAMPLER_WT", "1") == "1" and W % 8 == 0
    if wt:
        uvs = uvs.swapaxes(2, 3)  # (B, T, 4, Q) — tiny, outside the kernel
    kernel = functools.partial(_sample_kernel, W_img=W, RT=RT, wt=wt)
    flops = 2 * B * T * H * W * Q * C
    # flatten pixel positions OUTSIDE the kernel (free in HBM; an in-kernel
    # (RT, W, C) → (P, C) collapse forces a costly bf16 relayout)
    memory_flat = memory_hw.reshape(B, T, H * W, C)
    PT = RT * W
    # interpret mode off-TPU so tests/CPU fallback work unchanged
    interpret = jax.default_backend() != "tpu"
    uvs_spec = (pl.BlockSpec((1, 1, 4, Q), lambda b, t, r: (b, t, 0, 0),
                             memory_space=pltpu.VMEM) if wt else
                pl.BlockSpec((1, 1, Q, 4), lambda b, t, r: (b, t, 0, 0),
                             memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            uvs_spec,
            pl.BlockSpec((1, 1, PT, C), lambda b, t, r: (b, t, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, C), lambda b, t, r: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Q, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=memory_hw.size * memory_hw.dtype.itemsize
            + B * Q * C * 4,
            transcendentals=0),
        interpret=interpret,
    )(uvs, memory_flat)


def _sample_bwd_mem_kernel(uvs_ref, g_ref, out_ref, *, W_img: int, RT: int,
                           wt: bool = False):
    """d(memory) for one (b, t, row-tile, q-tile): the transpose of the
    sampling matmul — dmem_tile (+)= W_tileᵀ @ g. Replaces XLA's
    gather-transpose scatter-add, which serializes duplicate indices
    (measured 105 GiB/s, 2.1ms/decoder-iteration at the release shape).
    The q-tile axis is innermost: the output block is revisited
    consecutively and the contributions of all q-tiles (== all folded
    decoder iterations on the batched-grad path) accumulate in VMEM.
    `wt`: sublane-stacked transposed W build (see _build_w_tile_t) —
    dmem = Wt @ g becomes a plain NN matmul with aligned W stores."""
    r = pl.program_id(2)
    qb = pl.program_id(3)
    g = g_ref[0]                                               # (QT, C)
    precision = (jax.lax.Precision.HIGHEST
                 if g.dtype == jnp.float32 else None)
    if wt:
        w_tile_t = _build_w_tile_t(uvs_ref[0, 0], r * RT, RT,
                                   W_img)                      # (P, QT)
        contrib = jax.lax.dot_general(
            w_tile_t.astype(g.dtype), g, (((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32).astype(out_ref.dtype)
    else:
        w_tile = _build_w_tile(uvs_ref[0, 0], r * RT, RT,
                               W_img)                          # (QT, P)
        contrib = jax.lax.dot_general(
            w_tile.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32).astype(out_ref.dtype)
    if pl.num_programs(3) == 1:
        out_ref[0, 0] = contrib
    else:

        @pl.when(qb == 0)
        def _():
            out_ref[0, 0] = contrib

        @pl.when(qb > 0)
        def _():
            out_ref[0, 0] += contrib


def _pick_bwd_tiles(H: int, W: int, C: int, Q: int, itemsize: int):
    """(row-tile, q-tile) for the backward kernel under the v5e VMEM
    budget: double-buffered g/uvs inputs, the (PT, C) output block, and
    the wx/wy/w weight intermediates."""
    budget = 10 * 1024 * 1024
    qt = Q
    for cand in (512, 256, 128):
        if Q > cand and Q % cand == 0:
            qt = cand
            break
    for rt in (30, 20, 15, 12, 10, 8, 6, 5, 4, 3, 2, 1):
        if H % rt:
            continue
        g_bytes = 2 * qt * C * itemsize
        w_bytes = (rt + 2) * qt * W * 4
        out_bytes = 2 * rt * W * C * itemsize
        if g_bytes + w_bytes + out_bytes <= budget:
            return rt, qt
    return 1, qt


def _pallas_sample_bwd_mem(uvs: jnp.ndarray, g: jnp.ndarray,
                           mem_shape, mem_dtype) -> jnp.ndarray:
    """uvs: (B, T, Q, 4); g: (B, Q, C) → dmem (B, T, H, W, C)."""
    B, T, H, W, C = mem_shape
    Q = uvs.shape[2]
    RT, QT = _pick_bwd_tiles(H, W, C, Q, jnp.dtype(mem_dtype).itemsize)
    PT = RT * W
    interpret = jax.default_backend() != "tpu"
    # same transposed-W default as the forward (see _pallas_sample)
    import os
    wt = os.environ.get("PARQ_SAMPLER_WT", "1") == "1" and W % 8 == 0
    if wt:
        uvs = uvs.swapaxes(2, 3)  # (B, T, 4, Q)
    kernel = functools.partial(_sample_bwd_mem_kernel, W_img=W, RT=RT,
                               wt=wt)
    uvs_spec = (pl.BlockSpec((1, 1, 4, QT), lambda b, t, r, qb: (b, t, 0, qb),
                             memory_space=pltpu.VMEM) if wt else
                pl.BlockSpec((1, 1, QT, 4), lambda b, t, r, qb: (b, t, qb, 0),
                             memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=(B, T, H // RT, Q // QT),
        in_specs=[
            uvs_spec,
            pl.BlockSpec((1, QT, C), lambda b, t, r, qb: (b, qb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, PT, C),
                               lambda b, t, r, qb: (b, t, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, H * W, C), mem_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * H * W * Q * C,
            bytes_accessed=(B * T * H * W * C
                            * jnp.dtype(mem_dtype).itemsize
                            + B * Q * C * 4),
            transcendentals=0),
        interpret=interpret,
    )(uvs, g)
    return out.reshape(B, T, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sample_op_fast(memory_hw, uvs, diff_rows):
    return _xla_sample_from_uvs(memory_hw, uvs)


def _sample_fast_fwd(memory_hw, uvs, diff_rows):
    return _xla_sample_from_uvs(memory_hw, uvs), (memory_hw, uvs)


def _sample_fast_bwd(diff_rows, res, g):
    memory_hw, uvs = res
    # d(memory): Pallas matmul transpose (no scatter). The cotangent is
    # contracted in the MEMORY dtype — an f32 g forces HIGHEST-precision
    # 3-pass matmuls (measured 96GiB/s, slower than the scatter it
    # replaces); bf16 matches what the XLA scatter accumulated anyway.
    dmem = _pallas_sample_bwd_mem(uvs, g.astype(memory_hw.dtype),
                                  memory_hw.shape, memory_hw.dtype)
    # d(uvs): gather-only arithmetic — differentiate w.r.t. uvs alone so
    # XLA never builds the memory scatter. When the caller knows only the
    # first `diff_rows` query coordinates are differentiable (the decoder's
    # folded batched-grad call: iterations ≥ 1 enter through stop_gradient-ed
    # reference points), the coordinate VJP — 4 neighbor re-gathers + f32
    # weight chains over every row — runs on that slice only.
    R = uvs.shape[2] if diff_rows is None else min(diff_rows, uvs.shape[2])
    uvs_d = uvs[:, :, :R]
    _, vjp = jax.vjp(lambda u: _xla_sample_from_uvs(memory_hw, u), uvs_d)
    duvs_d, = vjp(g[:, :R].astype(jnp.float32))
    if R < uvs.shape[2]:
        duvs = jnp.zeros(uvs.shape, duvs_d.dtype).at[:, :, :R].set(duvs_d)
    else:
        duvs = duvs_d
    return dmem, duvs


_sample_op_fast.defvjp(_sample_fast_fwd, _sample_fast_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sample_op_pre(memory_hw, uvs, out, diff_rows):
    """Sampling with a PRECOMPUTED forward: the primal is `out`, produced
    by an identical earlier call (the decoder's trajectory pass). The
    backward is `_sample_fast_bwd` from (memory, uvs), so gradients are
    exact and the forward gathers never run again."""
    return out


def _sample_pre_fwd(memory_hw, uvs, out, diff_rows):
    return out, (memory_hw, uvs)


def _sample_pre_bwd(diff_rows, res, g):
    dmem, duvs = _sample_fast_bwd(diff_rows, res, g)
    return dmem, duvs, jnp.zeros(g.shape, g.dtype)


_sample_op_pre.defvjp(_sample_pre_fwd, _sample_pre_bwd)


def pixel_aligned_features_precomputed(
    memory_hw: jnp.ndarray,
    query_pos: jnp.ndarray,
    T_camera_local: Pose,
    camera: Camera,
    feat_size: Tuple[int, int],
    feats_pre: jnp.ndarray,
    diff_rows: int = None,
):
    """`pixel_aligned_features_fast` with the forward gathers skipped:
    `feats_pre` is the (B, Q, C) output of an identical earlier call. The
    projection reruns (cheap, keeps query-coordinate gradients exact) and
    the backward is the standard fast-path backward."""
    uvs, center_im, center_valid = _project_uvs(query_pos, T_camera_local,
                                                camera)
    feats = _sample_op_pre(memory_hw, uvs,
                           feats_pre.astype(jnp.float32), diff_rows)
    return feats.astype(memory_hw.dtype), center_im, center_valid


def pixel_aligned_features_fast(
    memory_hw: jnp.ndarray,
    query_pos: jnp.ndarray,
    T_camera_local: Pose,
    camera: Camera,
    feat_size: Tuple[int, int],
    force: bool = False,
    diff_rows: int = None,
):
    """Training-default sampling path on TPU: XLA-gather FORWARD (fastest
    at batch ≥ 4 — the fully-fused Pallas forward only wins at small batch)
    with the Pallas matmul BACKWARD for d(memory).

    Same contract as ops.pixel_align.pixel_aligned_features; the view-mean
    scale folds into the per-view weights (sum of scaled views) instead of
    a post-division — bitwise-identical in exact math, ~1 ulp apart in fp.

    `diff_rows`: static count of query rows whose COORDINATES are
    differentiable (None = all). The coordinate VJP is skipped for the
    rest — exact when those rows' positions are stop_gradient-ed upstream.
    """
    if jax.default_backend() != "tpu" and not force:
        return _xla_reference(memory_hw, query_pos, T_camera_local, camera,
                              feat_size)
    uvs, center_im, center_valid = _project_uvs(query_pos, T_camera_local,
                                                camera)
    feats = _sample_op_fast(memory_hw, uvs,
                            diff_rows).astype(memory_hw.dtype)
    return feats, center_im, center_valid


def _project_uvs(query_pos, T_camera_local: Pose, camera: Camera):
    """Projection + valid-mean scale, shared with the XLA path semantics."""
    query_pos_c = T_camera_local.transform(query_pos[:, None, :, :])
    center_im, center_valid = camera.project(query_pos_c)  # (B,T,Q,2/(B,T,Q)
    count = jnp.sum(center_valid.astype(jnp.float32), axis=1)  # (B, Q)
    count = jnp.where(count == 0, 1.0, count)
    scale = 1.0 / count[:, None, :]                        # (B, 1→T, Q)
    scale = jnp.broadcast_to(scale, center_valid.shape)
    uvs = jnp.concatenate([
        center_im,
        scale[..., None].astype(center_im.dtype),
        jnp.zeros_like(scale[..., None], center_im.dtype),
    ], axis=-1)
    return uvs, center_im, center_valid


def _xla_sample_from_uvs(memory_hw: jnp.ndarray, uvs: jnp.ndarray):
    """Pure-XLA sampling parameterized directly by (u, v, scale) — used as
    the exact VJP of the pallas kernel (identical math, differentiable in
    both memory and uvs)."""
    from ..ops.grid_sample import grid_sample_bilinear
    B, T, H, W, C = memory_hw.shape
    Q = uvs.shape[2]
    gx = 2.0 * uvs[..., 0] / (W - 1) - 1.0
    gy = 2.0 * uvs[..., 1] / (H - 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    feats = grid_sample_bilinear(
        memory_hw.reshape(B * T, H, W, C), grid.reshape(B * T, Q, 2))
    feats = feats.reshape(B, T, Q, C)
    return jnp.sum(feats * uvs[..., 2:3], axis=1)   # scale folds the mean


@jax.custom_vjp
def _sample_op(memory_hw, uvs):
    return _pallas_sample(memory_hw, uvs)


def _sample_fwd(memory_hw, uvs):
    return _sample_op(memory_hw, uvs), (memory_hw, uvs)


def _sample_bwd(res, g):
    """Exact VJP via the XLA formulation (identical math)."""
    memory_hw, uvs = res
    _, vjp = jax.vjp(_xla_sample_from_uvs, memory_hw, uvs)
    dm, duvs = vjp(g.astype(jnp.float32))
    return dm, duvs


_sample_op.defvjp(_sample_fwd, _sample_bwd)


def pixel_aligned_features_pallas(
    memory_hw: jnp.ndarray,
    query_pos: jnp.ndarray,
    T_camera_local: Pose,
    camera: Camera,
    feat_size: Tuple[int, int],
    force: bool = False,
):
    """Drop-in replacement for ops.pixel_align.pixel_aligned_features.

    Projection runs once (differentiable XLA); the fused kernel consumes the
    resulting (u, v, scale) tuple, so query-position gradients flow through
    the projection outside the custom_vjp boundary.

    `force=True` runs the kernel even at f32 (tests exercise the kernel at
    full precision this way).
    """
    if memory_hw.dtype == jnp.float32 and not force:
        # At f32 the kernel needs HIGHEST-precision MXU passes and loses to
        # XLA's native gather; the kernel wins for bf16 memory. Delegate.
        return _xla_reference(memory_hw, query_pos, T_camera_local, camera,
                              feat_size)
    uvs, center_im, center_valid = _project_uvs(query_pos, T_camera_local,
                                                camera)
    feats = _sample_op(memory_hw, uvs).astype(memory_hw.dtype)
    return feats, center_im, center_valid
