"""Fused FPN tail: upsample-to-level-0 + 1024-lane concat + rayPE add in
ONE output pass (ref: model/resnet_fpn.py:73-80 — resize levels 0..3 to
level-0 resolution, concatenate to C=1024; the rayPE add is
model/parq.py's `memory = features + encoding`).

Why a kernel: at release dims the XLA chain materializes each upsampled
level (3 x 59MB writes), concatenates (236MB read + 236MB write), reshapes
(B·T → B, T), and adds the 236MB rayPE encoding — ~1.4-2 ms of pure HBM
traffic in the r4 profiles (fwd:backbone2d/concatenate 1.089 ms +
fwd reshape 0.432 ms, bench_results/r4/profile_step_attr_265fps.log).
This kernel reads the four FPN conv outputs (78MB) + the encoding (236MB)
and writes the fused (B, T, h, w, 1024) memory once (236MB): every level's
upsample happens in VMEM, each level's result lands directly in its lane
slice [256·l, 256·(l+1)), and the (B·T → B, T) split rides the index map
for free.

Upsample math: levels 1/2 are exact integer factors (2x / 4x) — the
gather-free phase-lerp form (bit-identical to resnet_fpn.upsample_linear's
interleave: same weights, same dtype, commuted adds only) built from
jnp.repeat + pltpu.roll + iota selects (no lane-dim reshapes). Level 3's
non-integer ratio (8x10 → 60x80 at release dims) is computed OUTSIDE by
`resize_level3_separable` (two tiny einsums, MXU work ~0.05 ms) and passed
in pre-upsampled — its partial-pixel weights don't vectorize as phases.

Backward: custom VJP with an XLA adjoint — d(encoding) = g, d(c_l) =
linear_transpose of the reference interleave applied to g's lane slice
(exact adjoint of the same math; the transpose runs as plain XLA ops).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _clamped_shifts(x, axis: int):
    """Edge-clamped one-step neighbors along `axis`: (x[i-1], x[i+1])."""
    n = x.shape[axis]

    def sl(s):
        return tuple(s if a == axis else slice(None) for a in range(x.ndim))

    xp = jnp.concatenate([x[sl(slice(0, 1))], x[sl(slice(0, n - 1))]],
                         axis=axis)
    xn = jnp.concatenate([x[sl(slice(1, n))], x[sl(slice(n - 1, n))]],
                         axis=axis)
    return xp, xn


def _lerp_from_shifted(x, xp, xn, axis: int, f: int):
    """Integer-factor linear upsample along `axis` given the clamped
    neighbors (half-pixel centers — F.interpolate(align_corners=False)
    semantics), as repeat + phase-select: no stack/reshape interleave and
    no roll, so it lowers inside a Pallas kernel. Bit-identical to
    resnet_fpn._upsample_interleave_1d (same taps, same dtype math)."""
    rep = jnp.repeat(x, f, axis=axis)             # out[c] = x[c // f]
    left = jnp.repeat(xp, f, axis=axis)           # out[c] = x[clamp(c//f-1)]
    right = jnp.repeat(xn, f, axis=axis)          # out[c] = x[clamp(c//f+1)]
    # phase weights on an axis-aligned BROADCAST shape (1s elsewhere):
    # full-size int32 iota temporaries are 2x the bf16 data and blow the
    # kernel's VMEM stack at release dims. Phase offset
    # off_j = (j+0.5)/f - 0.5; neighbor weight a = |off_j| = |2j+1-f|/(2f),
    # built from INT ops + one exact dyadic multiply (v5e has no bf16
    # vector compare/divide), and off < 0 ⟺ 2j < f is an int compare.
    wshape = tuple(x.shape[ax] * f if ax == axis else 1
                   for ax in range(x.ndim))
    idx = jax.lax.broadcasted_iota(jnp.int32, wshape, axis)
    j = idx & (f - 1)                             # phase (f is 2 or 4)
    m = jnp.abs(2 * j + 1 - f)
    a = m.astype(x.dtype) * jnp.asarray(1.0 / (2 * f), x.dtype)
    neigh = jnp.where(2 * j < f, left, right)
    return a * neigh + (1 - a) * rep


def _phase_upsample_axis(x, axis: int, f: int, *, kernel: bool = False):
    """Upsample along `axis` computing the clamped shifts in place (the
    in-kernel W pass and the XLA twin; the kernel's H pass gets its
    shifts as pre-sliced operands instead — see _tail_call). `kernel` is
    accepted for call-site symmetry; one code path serves both."""
    del kernel
    xp, xn = _clamped_shifts(x, axis)
    return _lerp_from_shifted(x, xp, xn, axis, f)


def _phase_upsample_2d(x, f: int, *, kernel: bool = False):
    """(..., h, w, C) → (..., h·f, w·f, C), linear, integer factor.
    Spatial axes are the two before the channel axis (3D in-kernel
    blocks; 4D batched arrays in the XLA twin/adjoint)."""
    x = _phase_upsample_axis(x, x.ndim - 3, f, kernel=kernel)
    return _phase_upsample_axis(x, x.ndim - 2, f, kernel=kernel)


def _resize_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) linear-resize matrix: half-pixel centers, edges
    clamped — matches jax.image.resize(method='linear') upsampling and
    torch F.interpolate(align_corners=False)."""
    w = np.zeros((n_out, n_in), np.float32)
    for y in range(n_out):
        src = (y + 0.5) * n_in / n_out - 0.5
        i0 = int(np.floor(src))
        a = src - i0
        w[y, min(max(i0, 0), n_in - 1)] += 1.0 - a
        w[y, min(max(i0 + 1, 0), n_in - 1)] += a
    return w


def resize_level3_separable(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(BT, ih, iw, C) → (BT, h, w, C) bilinear via two small einsums —
    the non-integer-ratio level's upsample, computed in XLA (its MXU cost
    is ~0.05 ms at release dims; the phase-lerp form needs integer
    factors)."""
    ih, iw = x.shape[1:3]
    rh = jnp.asarray(_resize_weights(ih, h), x.dtype)
    rw = jnp.asarray(_resize_weights(iw, w), x.dtype)
    y = jnp.einsum("yh,bhwc->bywc", rh, x)
    return jnp.einsum("xw,bywc->byxc", rw, y)


def _copy_kernel(c_ref, buf_ref, out_ref):
    out_ref[0, 0] = buf_ref[0, 0] + c_ref[0].astype(out_ref.dtype)


def _up_kernel(c_ref, hp_ref, hn_ref, buf_ref, out_ref, *, f: int):
    # H pass from PRE-SLICED clamped neighbors (hp/hn are global shifts
    # computed outside, so H-tiling needs no halo); W pass shifts
    # in-kernel (full width is in-block).
    t = _lerp_from_shifted(c_ref[0], hp_ref[0], hn_ref[0], 0, f)
    up = _phase_upsample_axis(t, 1, f)
    out_ref[0, 0] = buf_ref[0, 0] + up.astype(out_ref.dtype)


def _tail_call(c0, c1, c2, u3, enc, B: int, T: int, interpret: bool):
    BT, h, w, C = c0.shape
    assert BT == B * T
    assert c1.shape[1:3] == (h // 2, w // 2) and h % 2 == 0 and w % 2 == 0
    assert c2.shape[1:3] == (h // 4, w // 4) and h % 4 == 0 and w % 4 == 0
    assert u3.shape == c0.shape
    assert enc.shape == (B, T, h, w, 4 * C)
    dt = enc.dtype
    # Four chained in-place calls, one per level, each accumulating its
    # upsampled level into lane slice [C·l, C·(l+1)) of ONE buffer that
    # STARTS as the rayPE encoding (input_output_aliases donates it
    # through the chain — unwritten lane blocks keep their contents).
    # A single 4-branch kernel blew the 16MB VMEM stack at release dims
    # (22.4M: every branch's upsample temporaries were allocated
    # together, nothing reused); per-level calls + 128-lane channel
    # chunks + H-tiling keep the peak small. Each c_l is still read once
    # and the buffer is read+written once per level.
    cc = max(1, C // 128)
    Cb = C // cc
    # H tiles: the mosaic stack allocator keeps every upsample temporary
    # live, so bound them by splitting H. Needs h/4 (the level-2 rows)
    # divisible; the level shifts are precomputed globally so tiles
    # need no halo.
    nt = 3 if (h // 4) % 3 == 0 else 1

    def level_call(level, inputs, buf, hl, wl, kernel):
        def c_idx(b, t, cch, ht):
            return (b * T + t, ht, 0, cch)

        def buf_idx(b, t, cch, ht):
            return (b, t, ht, 0, level * cc + cch)

        c_spec = pl.BlockSpec((1, hl // nt, wl, Cb), c_idx,
                              memory_space=pltpu.VMEM)
        buf_spec = pl.BlockSpec((1, 1, h // nt, w, Cb), buf_idx,
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B, T, cc, nt),
            in_specs=[c_spec] * len(inputs) + [buf_spec],
            out_specs=buf_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, h, w, 4 * C), dt),
            input_output_aliases={len(inputs): 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary",
                                     "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=12 * B * T * h * w * Cb * cc,
                bytes_accessed=(sum(x.size * x.dtype.itemsize
                                    for x in inputs)
                                + 2 * B * T * h * w * C
                                * enc.dtype.itemsize),
                transcendentals=0),
            interpret=interpret,
        )(*inputs, buf)

    buf = enc
    for level, (c, hl, wl) in enumerate([
            (c0, h, w), (c1, h // 2, w // 2), (c2, h // 4, w // 4),
            (u3, h, w)]):
        c = c.astype(dt)
        if level in (0, 3):
            buf = level_call(level, (c,), buf, hl, wl, _copy_kernel)
        else:
            hp, hn = _clamped_shifts(c, 1)    # global H shifts — no halo
            buf = level_call(
                level, (c, hp, hn), buf, hl, wl,
                functools.partial(_up_kernel, f=2 ** level))
    return buf


def _xla_level_upsample(c, level: int, h: int, w: int):
    """XLA twin of what the kernel does to level `level` — used by the
    adjoint (via linear_transpose) and by tests."""
    if level == 0:
        return c
    return _phase_upsample_2d(c, 2 ** level, kernel=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fpn_tail_concat(c0, c1, c2, u3, enc, B: int, T: int,
                    interpret: bool = False):
    """Fused FPN tail: `memory = concat(up(levels 0..3)) + encoding`,
    reshaped to (B, T, h, w, 4C), in one HBM output pass.

    Args:
      c0..c2: FPN smoothing-conv outputs, (B·T, h/2^l, w/2^l, C).
      u3: level 3 ALREADY upsampled to (B·T, h, w, C)
        (`resize_level3_separable` — its ratio is non-integer).
      enc: rayPE encoding (B, T, h, w, 4C); also fixes the output dtype.
    """
    return _tail_call(c0, c1, c2, u3, enc, B, T, interpret)


def _fpn_tail_fwd(c0, c1, c2, u3, enc, B, T, interpret):
    return _tail_call(c0, c1, c2, u3, enc, B, T, interpret), None


def _fpn_tail_bwd(B, T, interpret, _, g):
    """Adjoint in plain XLA: d(enc) = g; d(c_l) = transpose of the level's
    linear upsample applied to g's lane slice (exact — linear_transpose of
    the same interleave math). Runs in the train backward only; the r4
    profile's bwd cost for this region was ~0.7 ms and the transposed
    interleave is the same class of work."""
    Bb, Tt, h, w, C4 = g.shape
    C = C4 // 4
    g_flat = g.reshape(Bb * Tt, h, w, C4)
    outs = []
    for l, cshape in enumerate([(h, w), (h // 2, w // 2), (h // 4, w // 4)]):
        gl = g_flat[..., l * C:(l + 1) * C]
        if l == 0:
            outs.append(gl)
            continue
        fn = functools.partial(_xla_level_upsample, level=l, h=h, w=w)
        proto = jax.ShapeDtypeStruct((Bb * Tt,) + cshape + (C,), gl.dtype)
        (dc,) = jax.linear_transpose(fn, proto)(gl)
        outs.append(dc)
    du3 = g_flat[..., 3 * C:]
    return tuple(outs) + (du3, g.astype(g.dtype))


fpn_tail_concat.defvjp(_fpn_tail_fwd, _fpn_tail_bwd)
