#!/usr/bin/env python
"""Real-TPU validation + perf of the flash cross-attention custom VJP:
fwd/bwd parity vs XLA at rate=0, dropout statistics, and grad timing."""
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
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    B, H, Q, D, N = 8, 4, 256, 256, 14400
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, H, Q, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, N, D), jnp.bfloat16) * 0.3
    v = jax.random.normal(kv, (B, H, N, D), jnp.bfloat16)

    # ---- gradient parity at rate=0 -----------------------------------
    def loss_kernel(q, k, v):
        o = flash_cross_attention(q, k, v, interpret=False)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(cross_attention_reference(q, k, v)
                       .astype(jnp.float32) ** 2)

    g1 = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", g1, g2):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        scale = float(jnp.max(jnp.abs(b)))
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"d{name}: max abs err {err:.4f} (scale {scale:.2f}, "
              f"rel {err / max(scale, 1e-9):.5f})")

    # ---- dropout statistics ------------------------------------------
    rate = 0.1
    o0 = flash_cross_attention(q, k, v, interpret=False)
    od = flash_cross_attention(q, k, v, dropout_rate=rate, dropout_seed=7,
                               interpret=False)
    od2 = flash_cross_attention(q, k, v, dropout_rate=rate, dropout_seed=7,
                                interpret=False)
    od3 = flash_cross_attention(q, k, v, dropout_rate=rate, dropout_seed=9,
                                interpret=False)
    print("dropout deterministic per seed:",
          bool(jnp.all(od == od2)), "| differs across seeds:",
          bool(jnp.any(od != od3)))
    m0 = float(jnp.mean(jnp.abs(o0.astype(jnp.float32))))
    md = float(jnp.mean(jnp.abs((od - o0).astype(jnp.float32))))
    print(f"dropout perturbation: mean|o|={m0:.4f} mean|od-o|={md:.4f}")

    # dropout grads run
    def loss_drop(q, k, v):
        o = flash_cross_attention(q, k, v, dropout_rate=rate,
                                  dropout_seed=7, interpret=False)
        return jnp.sum(o.astype(jnp.float32) ** 2)
    gd = jax.jit(jax.grad(loss_drop, argnums=(0, 1, 2)))(q, k, v)
    print("dropout grads finite:",
          all(bool(jnp.all(jnp.isfinite(x.astype(jnp.float32))))
              for x in gd))

    # ---- perf: grad of attention, kernel vs XLA ----------------------
    iters = 20

    def timeit(fn):
        @jax.jit
        def run(q, k, v):
            def body(i, acc):
                g = jax.grad(fn, argnums=(0, 1, 2))(q * (1 + 0 * acc), k, v)
                return acc + g[0].astype(jnp.float32).reshape(-1)[0]
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        out = run(q, k, v)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(q, k, v)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"grad kernel (rate=0): {timeit(loss_kernel):.3f} ms/call")
    print(f"grad kernel (rate=.1): {timeit(loss_drop):.3f} ms/call")
    print(f"grad xla    (rate=0): {timeit(loss_ref):.3f} ms/call")


if __name__ == "__main__":
    main()
