"""Sequence-parallel cross-attention over the memory-token axis.

The decoder's dominant cost is cross-attention of Q=256 queries against
N = T·h·w ≈ 14.4k memory tokens (59 MB of K/V at release dims, bf16).
The reference has no answer beyond one GPU (its only parallelism is DDP,
ref: train.py:103-110); here the K/V tokens shard over the mesh's `model`
axis and each device runs the existing flash kernel on its local shard —
the TPU-native long-context axis (flash-decoding-style partial-softmax
merge over ICI, scaling-book recipe: shard, compute local, combine with
one small collective).

Math: each shard i computes (o_i, lse_i) over its token slice with the
zero-copy flash kernel. With m = max_i lse_i and w_i = exp(lse_i − m):

    o  = Σ_i o_i · w_i / Σ_i w_i          (exact global softmax output)
    lse = m + log Σ_i w_i                 (exact global logsumexp)

Gradients: the merged (o, lse) feed `flash_cross_attention_precomputed`,
whose custom VJP runs the standard flash backward from the GLOBAL (o, lse)
against the LOCAL (k_i, v_i) — p_ij = exp(s_ij − lse) is the true global
softmax probability of a local column, so dk_i/dv_i are exact, and the
replicated-q in_spec makes shard_map psum the per-shard dq cotangents.
The merge arithmetic itself carries no gradient (fwd_lse is declared
zero-grad), so nothing is double-counted.

Three entry points mirror the single-device flash API so the decoder's
batched-gradient machinery works sequence-parallel unchanged:
  sp_flash_cross_attention            — differentiable attention
  sp_flash_cross_attention_fwd_lse    — zero-grad (o, lse) for trajectory
                                        passes (phase 1 of batched-grad)
  sp_flash_cross_attention_precomputed — backward-only against stored
                                        global (o, lse) (phase 2)

Only the collectives touch the network: one pmax + two psums over
(B, H, Q, 128)/(B, H, Q, D) — ~0.5 MB at release dims vs the 59 MB K/V
that now never moves.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import MODEL_AXIS

# decorrelates the in-kernel dropout hash across shards: the kernel's mask
# column index is shard-local, so identical seeds on every shard would draw
# identical masks for different global columns
_SHARD_SEED_STRIDE = np.int32(np.uint32(0x9E3779B1))  # golden-ratio odd


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _scale_grad(x, s: float):
    """Identity whose VJP multiplies the cotangent by `s`.

    shard_map with check_vma=False splits a replicated (out_specs=P())
    output's cotangent evenly across the mesh — every in-body gradient
    arrives scaled by 1/mesh.size. Pre-compensating here keeps the body's
    flash VJP + the replicated-q psum exact (pinned by
    tests/test_seq_parallel.py::test_sp_gradients_match_xla)."""
    return x


def _scale_grad_fwd(x, s):
    return x, None


def _scale_grad_bwd(s, _, g):
    return (g * s,)


_scale_grad.defvjp(_scale_grad_fwd, _scale_grad_bwd)


def _merge_partials(o_i, lse_i, axis: str):
    """LSE-weighted merge of per-shard flash partials → global (o, lse).

    lse_i arrives lane-broadcast (B, H, Q, 128) f32 straight from the
    kernel; the merge keeps that layout so the result can feed the
    precomputed-backward without a relayout."""
    m = jax.lax.pmax(lse_i, axis)
    w = jnp.exp(lse_i - m)                                # (B, H, Q, 128)
    num = jax.lax.psum(
        o_i.astype(jnp.float32) * w[..., :1], axis)       # (B, H, Q, D)
    den = jax.lax.psum(w, axis)
    o = (num / den[..., :1]).astype(o_i.dtype)
    lse = m + jnp.log(den)
    return o, lse


def _prep_sp(q, k, v, mesh, axis, block_k, dropout_seed):
    size = mesh.shape[axis]
    B, H, Q, D = q.shape
    N = k.shape[1]
    assert k.ndim == 3 and k.shape[-1] == H * D and v.shape == k.shape, (
        "SP path wants the zero-copy (B, N, H·D) K/V layout", k.shape)
    assert N % size == 0, f"N={N} not divisible by {axis}={size}"
    n_local = N // size
    block_k = min(block_k, max(8, -(-n_local // 8) * 8))
    seeds = (None if dropout_seed is None
             else jnp.asarray(dropout_seed).reshape(-1).astype(jnp.int32))
    return size, n_local, block_k, seeds


def _local_seed(seed_args, axis):
    if not seed_args:
        return None
    idx = jax.lax.axis_index(axis).astype(jnp.int32)
    return seed_args[0] + idx * jnp.int32(_SHARD_SEED_STRIDE)


def sp_flash_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             *, mesh: Mesh, axis: str = MODEL_AXIS,
                             block_k: int = 1440,
                             dropout_rate: float = 0.0,
                             dropout_seed=None, q_tile: int = None,
                             interpret: bool = None) -> jnp.ndarray:
    """Flash cross-attention with K/V sequence-sharded over `mesh[axis]`.

    Args:
      q: (B, H, Q, D) queries, replicated over `axis`.
      k, v: (B, N, H·D) memory K/V in the projections' natural zero-copy
        layout, sharded (or shardable) on the token axis 1. N must divide
        by the axis size; all N tokens are attended (the model's memory
        tokens are always fully valid — n_valid only exists for block
        padding, which each shard handles locally).
      dropout_seed: as in `flash_cross_attention` (scalar or (G,) vector);
        per-shard seeds are derived internally so masks decorrelate.

    Returns the exact global attention output (B, H, Q, D), replicated.
    Differentiable (dq/dk/dv exact); with size-1 meshes it degrades to the
    plain single-device kernel call.
    """
    from ..kernels.cross_attention_pallas import (
        flash_cross_attention, flash_cross_attention_fwd_lse,
        flash_cross_attention_precomputed)

    size, n_local, block_k, seeds = _prep_sp(q, k, v, mesh, axis, block_k,
                                             dropout_seed)
    if size == 1:
        return flash_cross_attention(
            q, k, v, block_k=block_k, n_valid=k.shape[1],
            dropout_rate=dropout_rate, dropout_seed=dropout_seed,
            q_tile=q_tile, interpret=interpret)

    def body(q, k, v, *seed_args):
        kwargs = dict(block_k=block_k, n_valid=n_local,
                      dropout_rate=dropout_rate,
                      dropout_seed=_local_seed(seed_args, axis),
                      q_tile=q_tile, interpret=interpret)
        o_i, lse_i = flash_cross_attention_fwd_lse(q, k, v, **kwargs)
        # the merge carries no gradient by construction (fwd_lse is a
        # declared-zero-grad op; real gradients flow through the
        # precomputed VJP below) — stop_gradient also keeps reverse-mode
        # from needing a pmax differentiation rule
        o_g, lse_g = _merge_partials(jax.lax.stop_gradient(o_i),
                                     jax.lax.stop_gradient(lse_i), axis)
        # differentiable pass-through: primal is o_g, VJP is the flash
        # backward from the global (o, lse) against the local K/V shard.
        # The cotangent arriving here is split 1/size by the unchecked
        # replicated out-spec — _scale_grad(·, size) restores it (every
        # non-SP mesh axis recovers its replication psum exactly).
        o = flash_cross_attention_precomputed(q, k, v, o_g, lse_g, **kwargs)
        return _scale_grad(o, float(size))

    kv_spec = P(None, axis, None)
    in_specs = (P(), kv_spec, kv_spec) + ((P(),) if seeds is not None else ())
    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=P(),
                       check_vma=False)
    return fn(q, k, v, *(() if seeds is None else (seeds,)))


def sp_flash_cross_attention_fwd_lse(q, k, v, *, mesh: Mesh,
                                     axis: str = MODEL_AXIS,
                                     block_k: int = 1440,
                                     dropout_rate: float = 0.0,
                                     dropout_seed=None, q_tile: int = None,
                                     interpret: bool = None):
    """Sequence-parallel forward that also returns the GLOBAL rowwise
    logsumexp — the SP mirror of `flash_cross_attention_fwd_lse` (zero
    gradient by declaration; feeds stop-gradient trajectory passes whose
    stored (o, lse) later drive `sp_flash_cross_attention_precomputed`)."""
    from ..kernels.cross_attention_pallas import flash_cross_attention_fwd_lse

    size, n_local, block_k, seeds = _prep_sp(q, k, v, mesh, axis, block_k,
                                             dropout_seed)
    if size == 1:
        return flash_cross_attention_fwd_lse(
            q, k, v, block_k=block_k, n_valid=k.shape[1],
            dropout_rate=dropout_rate, dropout_seed=dropout_seed,
            q_tile=q_tile, interpret=interpret)

    def body(q, k, v, *seed_args):
        o_i, lse_i = flash_cross_attention_fwd_lse(
            q, k, v, block_k=block_k, n_valid=n_local,
            dropout_rate=dropout_rate,
            dropout_seed=_local_seed(seed_args, axis), q_tile=q_tile,
            interpret=interpret)
        # zero-grad by contract (mirrors the single-device fwd_lse); the
        # stop_gradient also keeps reverse-mode tracing away from pmax,
        # which has no differentiation rule
        return _merge_partials(jax.lax.stop_gradient(o_i),
                               jax.lax.stop_gradient(lse_i), axis)

    kv_spec = P(None, axis, None)
    in_specs = (P(), kv_spec, kv_spec) + ((P(),) if seeds is not None else ())
    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(), P()), check_vma=False)
    return fn(q, k, v, *(() if seeds is None else (seeds,)))


def sp_flash_cross_attention_kv_fused(q: jnp.ndarray, kv: jnp.ndarray, *,
                                      mesh: Mesh, axis: str = MODEL_AXIS,
                                      block_k: int = 1920,
                                      interpret: bool = None) -> jnp.ndarray:
    """Sequence-parallel flash attention over the FUSED head-interleaved
    (B, N, H·2D) K/V buffer, sharded on the token axis — the multi-chip
    serving path keeps the single-projection-matmul + one-DMA-per-head
    layout AND shards the tokens. Inference only (like the single-device
    kv_fused entry)."""
    from ..kernels.cross_attention_pallas import (
        flash_cross_attention_kv_fused)

    size = mesh.shape[axis]
    B, H, Q, D = q.shape
    N = kv.shape[1]
    assert kv.ndim == 3 and kv.shape[-1] == 2 * H * D, (q.shape, kv.shape)
    if size == 1:
        return flash_cross_attention_kv_fused(q, kv, block_k=block_k,
                                              n_valid=N, interpret=interpret)
    assert N % size == 0, f"N={N} not divisible by {axis}={size}"
    n_local = N // size
    bk = min(block_k, max(8, -(-n_local // 8) * 8))

    def body(q, kv):
        o_i, lse_i = flash_cross_attention_kv_fused(
            q, kv, block_k=bk, n_valid=n_local, want_lse=True,
            interpret=interpret)
        o_g, _ = _merge_partials(o_i, lse_i, axis)
        return o_g

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(), P(None, axis, None)), out_specs=P(),
                       check_vma=False)
    return fn(q, kv)


def sp_flash_cross_attention_precomputed(q, k, v, o, lse, *, mesh: Mesh,
                                         axis: str = MODEL_AXIS,
                                         block_k: int = 1440,
                                         dropout_rate: float = 0.0,
                                         dropout_seed=None,
                                         q_tile: int = None,
                                         interpret: bool = None):
    """Sequence-parallel flash attention whose forward kernel is SKIPPED:
    (o, lse) are the GLOBAL merged results of an identical earlier
    `sp_flash_cross_attention_fwd_lse` call (same q/k/v/seeds). The VJP
    runs the flash backward per shard from the global (o, lse) — exact
    dq/dk/dv, as in the single-device precomputed path."""
    from ..kernels.cross_attention_pallas import (
        flash_cross_attention_precomputed)

    size, n_local, block_k, seeds = _prep_sp(q, k, v, mesh, axis, block_k,
                                             dropout_seed)
    if size == 1:
        return flash_cross_attention_precomputed(
            q, k, v, o, lse, block_k=block_k, n_valid=k.shape[1],
            dropout_rate=dropout_rate, dropout_seed=dropout_seed,
            q_tile=q_tile, interpret=interpret)

    def body(q, k, v, o, lse, *seed_args):
        out = flash_cross_attention_precomputed(
            q, k, v, o, lse, block_k=block_k, n_valid=n_local,
            dropout_rate=dropout_rate,
            dropout_seed=_local_seed(seed_args, axis), q_tile=q_tile,
            interpret=interpret)
        return _scale_grad(out, float(size))

    kv_spec = P(None, axis, None)
    in_specs = (P(), kv_spec, kv_spec, P(), P()) \
        + ((P(),) if seeds is not None else ())
    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=P(),
                       check_vma=False)
    return fn(q, k, v, o, lse, *(() if seeds is None else (seeds,)))
