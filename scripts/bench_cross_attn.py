#!/usr/bin/env python
"""Microbench: fused cross-attention kernel vs XLA materializing attention
at the release shape (B=8, H=4, Q=256, D=256, N=14400) on the real TPU.

Times with lax.fori_loop inside one jit (the axon tunnel adds ~750us per
dispatch — per-call wall timing would swamp the kernel)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax
import jax.numpy as jnp

from parq_tpu.kernels.cross_attention_pallas import (
    cross_attention_reference, flash_cross_attention)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--q", type=int, default=256)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--n", type=int, default=14400)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--block-k", type=int, default=1024)
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, Q, D, N = args.batch, args.heads, args.q, args.d, args.n
    q = jax.random.normal(kq, (B, H, Q, D), dt)
    k = jax.random.normal(kk, (B, H, N, D), dt) * 0.3
    v = jax.random.normal(kv, (B, H, N, D), dt)

    def loop(fn):
        @jax.jit
        def run(q, k, v):
            def body(_, acc):
                o = fn(q + acc[0, 0, 0, :1] * 0, k, v)
                return o
            return jax.lax.fori_loop(0, args.iters, body,
                                     jnp.zeros((B, H, Q, D), dt))
        return run

    fused = loop(lambda q, k, v: flash_cross_attention(
        q, k, v, block_k=args.block_k, interpret=False))
    xla = loop(cross_attention_reference)

    # kernel-only: K pre-transposed AND pre-padded to a block multiple, so
    # the wrapper's swapaxes/pad contribute nothing (the decoder hoists
    # both out of the recurrence)
    npad = (-N) % args.block_k
    kt_p = jnp.pad(jnp.swapaxes(k, -1, -2), ((0, 0),) * 3 + ((0, npad),))
    v_p = jnp.pad(v, ((0, 0),) * 2 + ((0, npad), (0, 0)))

    def fused_kernel_only(qq, kk, vv):
        return flash_cross_attention(qq, kk, vv, block_k=args.block_k,
                                     k_transposed=True, interpret=False)
    fused_ko = loop(fused_kernel_only)

    # correctness on-chip first
    o1 = flash_cross_attention(q, k, v, block_k=args.block_k,
                               interpret=False)
    o2 = cross_attention_reference(q, k, v)
    err = jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)))
    print(f"max abs err fused vs exact: {float(err):.5f}")

    for name, fn in [("fused", fused), ("fused-ko", None), ("xla", xla)]:
        if name == "fused-ko":
            out = fused_ko(q, kt_p, v_p)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = fused_ko(q, kt_p, v_p)
            jax.block_until_ready(out)
            dt_s = time.perf_counter() - t0
            print(f"{name:>8}: {dt_s / args.iters * 1e3:.3f} ms/call")
            continue
        out = fn(q, k, v)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(q, k, v)
        jax.block_until_ready(out)
        dt_s = time.perf_counter() - t0
        per = dt_s / args.iters * 1e3
        print(f"{name:>6}: {per:.3f} ms/call  "
              f"({args.iters} iters, {dt_s:.2f}s total)")


if __name__ == "__main__":
    main()
