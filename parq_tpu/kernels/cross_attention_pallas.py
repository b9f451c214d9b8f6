"""Shape-tuned fused cross-attention kernel for the PARQ decoder.

The decoder's dominant cost is cross-attention of 256 queries against the
T·H·W ≈ 14.4k memory tokens at head_dim 256 (ref: model/transformer_parq.py
:377-380). XLA's attention materializes the (B, H, Q, N) logits in HBM —
≈1GB of traffic per decoder iteration at the release config (measured round
1) — and is bandwidth-bound. This kernel streams K/V blocks through VMEM
and keeps the softmax online (flash-style), so the logits never exist in
HBM: per (b, h) the whole query block (256×256) plus one K/V block live
on-chip and both matmuls hit the MXU back-to-back.

TPU-specific choices:
- K arrives PRE-TRANSPOSED as (B, H, D, N): both matmuls are then in the
  MXU-canonical (M,K)x(K,N) orientation — a contraction on the last dim of
  both operands would force Mosaic to relayout every K block in VMEM.
  The transpose is done once outside (the decoder recurrence reuses the
  same K/V for all 8 iterations).
- exp via exp2 (VPU-native) instead of the polynomial exp.
- grid (B, H, NB) with the KV-block axis innermost and (b, h) declared
  parallel; the (m, l, acc) scratch carries across NB steps and the output
  block is written on the last one.
- big-negative (not -inf) masking for the padded KV tail keeps exp NaN-free.

Why not the library flash kernel: measured ~30% slower than XLA at this
shape in round 1 (generic block structure, segment-id plumbing, small
grid). This one is specialized to the PARQ shape.

VMEM budget per program at the release shape (Q=256, D=256, BK=3712, bf16):
q 128KB + double-buffered k,v 2x1.9MB + s 3.8MB f32 + acc 256KB f32 + m/l
256KB ≈ 8.2MB — inside the 16MB v5e VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # big-negative (not -inf) keeps exp() NaN-free on pad blocks
LOG2E = 1.4426950408889634


def _attn_kernel(q_ref, kt_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                 sm_scale: float, block_k: int, n_valid: int, n_total: int):
    nb = pl.program_id(2)

    @pl.when(nb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]                                   # (Q, D)
    kt = kt_ref[0, 0]                                 # (D, BK)
    v = v_ref[0, 0]                                   # (BK, D)

    # both dots are MXU-canonical: contraction dim is lhs-lane / rhs-sublane
    s = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # (Q, BK) f32

    # mask the zero-padded tail of the KV axis (static n_valid)
    if n_valid < n_total:
        kv_idx = nb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx < n_valid, s, NEG_INF)

    m_prev = m_scr[:, 0:1]                            # (Q, 1)
    l_prev = l_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp2(LOG2E * (m_prev - m_new))        # (Q, 1)
    p = jnp.exp2(LOG2E * s - LOG2E * m_new)           # (Q, BK) f32
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (Q, D)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(nb == pl.num_programs(2) - 1)
    def _():
        o_ref[0, 0] = (acc_scr[:] / l_scr[:, 0:1]).astype(o_ref.dtype)


def cross_attention_reference(q: jnp.ndarray, k: jnp.ndarray,
                              v: jnp.ndarray) -> jnp.ndarray:
    """Exact-softmax oracle, same layout: q (B,H,Q,D), k/v (B,H,N,D)."""
    sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * sm_scale,
                   k.astype(jnp.float32))
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w,
                      v.astype(jnp.float32)).astype(q.dtype)


def pad_kv_for_flash(k_t: jnp.ndarray, v: jnp.ndarray,
                     block_k: int = 3712):
    """Pad pre-transposed K (B,H,D,N) and V (B,H,N,D) to a block multiple.
    Callers that reuse K/V across iterations (the decoder recurrence) do
    this ONCE; per-call padding would cost ~0.3ms/iter of HBM traffic."""
    N = k_t.shape[-1]
    block_k = min(block_k, max(128, -(-N // 128) * 128))
    n_pad = (-N) % block_k
    if n_pad:
        k_t = jnp.pad(k_t, ((0, 0), (0, 0), (0, 0), (0, n_pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
    return k_t, v


def flash_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          *, block_k: int = 3712, k_transposed: bool = False,
                          n_valid: int = None,
                          interpret: bool = None) -> jnp.ndarray:
    """Fused full (unmasked) cross-attention.

    Args:
      q: (B, H, Q, D) queries. Q must be sublane-aligned (multiple of 8).
      k: (B, H, N, D) keys, or (B, H, D, N) when `k_transposed=True` (the
        fast path — callers that reuse K across iterations should store it
        pre-transposed AND pre-padded via `pad_kv_for_flash`; the per-call
        swapaxes/pad otherwise costs more than the kernel saves).
      v: (B, H, N, D) memory values.
      n_valid: true token count when k/v arrive pre-padded; padding beyond
        it is masked out of the softmax.
    Returns:
      (B, H, Q, D) attention output, dtype of q.
    """
    B, H, Q, D = q.shape
    if not k_transposed:
        k = jnp.swapaxes(k, -1, -2)            # (B, H, N, D) → (B, H, D, N)
    N = k.shape[-1]
    n_valid = int(n_valid) if n_valid is not None else N
    sm_scale = 1.0 / (D ** 0.5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    block_k = min(block_k, max(128, -(-N // 128) * 128))
    nb = -(-N // block_k)
    n_pad = nb * block_k - N
    if n_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, n_pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, n_pad), (0, 0)))

    kernel = functools.partial(_attn_kernel, sm_scale=sm_scale,
                               block_k=block_k, n_valid=n_valid,
                               n_total=nb * block_k)
    grid = (B, H, nb)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Q, D), lambda b, h, n: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, block_k), lambda b, h, n: (b, h, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, n: (b, h, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Q, D), lambda b, h, n: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Q, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Q, 128), jnp.float32),   # running max m
            pltpu.VMEM((Q, 128), jnp.float32),   # running denom l
            pltpu.VMEM((Q, D), jnp.float32),     # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            # b/h are independent; only the kv axis carries the scratch
            # recurrence — lets Mosaic pipeline output writes across (b,h)
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Q * (N + n_pad) * D,
            bytes_accessed=(q.size * q.dtype.itemsize
                            + 2 * k.size * k.dtype.itemsize
                            + B * H * Q * D * q.dtype.itemsize),
            transcendentals=B * H * Q * (N + n_pad)),
        interpret=interpret,
    )(q, k, v)
