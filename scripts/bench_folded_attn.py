#!/usr/bin/env python
"""Folded (L*Q) flash cross-attention vs L per-iteration calls, fwd and
fwd+bwd, at the release shape. Decides the batched-grad kernel layout."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
import jax, jax.numpy as jnp
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:
    pass
from parq_tpu.kernels.cross_attention_pallas import flash_cross_attention

B, H, Q0, D, N, L = 8, 4, 256, 256, 14400, 8
NP = 15360
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, H, L * Q0, D), jnp.bfloat16)
kt = jax.random.normal(key, (B, H, D, NP), jnp.bfloat16)
v = jax.random.normal(key, (B, H, NP, D), jnp.bfloat16)
seeds = jnp.arange(L, dtype=jnp.int32)

def timed(name, fn, *args, iters=20):
    r = jax.jit(lambda *a: jax.lax.fori_loop(
        0, iters, lambda i, acc: acc + fn(*a), jnp.float32(0)))
    out = r(*args); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = r(*args); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:36s} {dt:7.2f} ms")

def folded(rate, bk):
    def f(q, kt, v):
        o = flash_cross_attention(q, kt, v, k_transposed=True, n_valid=N,
                                  block_k=bk, q_tile=Q0,
                                  dropout_rate=rate,
                                  dropout_seed=seeds if rate else None)
        return jnp.sum(o.astype(jnp.float32))
    return f

def periter(rate, bk):
    def f(q, kt, v):
        acc = jnp.float32(0)
        for l in range(L):
            o = flash_cross_attention(q[:, :, l*Q0:(l+1)*Q0], kt, v,
                                      k_transposed=True, n_valid=N,
                                      block_k=bk, dropout_rate=rate,
                                      dropout_seed=seeds[l] if rate else None)
            acc += jnp.sum(o.astype(jnp.float32))
        return acc
    return f

for rate in (0.0, 0.1):
    for bk, tag in ((1280, "bk1280"), (1920, "bk1920")):
        timed(f"folded fwd   rate={rate} {tag}", folded(rate, bk), q, kt, v)
    timed(f"per-iter fwd rate={rate} bk1920", periter(rate, 1920), q, kt, v)
    gf = jax.grad(folded(rate, 1280), argnums=(0, 1, 2))
    timed(f"folded fwd+bwd rate={rate} bk1280",
          lambda q, kt, v: sum(jnp.sum(x.astype(jnp.float32)) for x in gf(q, kt, v)),
          q, kt, v, iters=10)
    gp = jax.grad(periter(rate, 1920), argnums=(0, 1, 2))
    timed(f"per-iter fwd+bwd rate={rate} bk1920",
          lambda q, kt, v: sum(jnp.sum(x.astype(jnp.float32)) for x in gp(q, kt, v)),
          q, kt, v, iters=10)
