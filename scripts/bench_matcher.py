#!/usr/bin/env python
"""Microbench: on-device matcher (per train step = B samples x L decoder
iterations of LAP + proximity matching) on the real TPU, plus a breakdown
of the full train step (forward / backward / matcher) to find where the
103-fps train step actually goes."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax
import jax.numpy as jnp


def bench_matcher(B, L, Q, K, n_valid, iters):
    from parq_tpu.ops.hungarian import match_batch

    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (B * L, Q, 10))
    coord = jax.random.uniform(key, (B * L, Q, 3)) * 6 - 3
    labels = jnp.where(jnp.arange(K)[None, :] < n_valid,
                       jnp.ones((B * L, K), jnp.int32), -1)
    centers = jax.random.uniform(key, (B * L, K, 3)) * 6 - 3
    valid = jnp.broadcast_to(jnp.arange(K) < n_valid, (B * L, K))

    @jax.jit
    def run(logits, coord, labels, centers, valid, key):
        def body(i, acc):
            res = match_batch(logits + acc * 0, coord, labels, centers,
                              valid, key)
            return acc + jnp.sum(res.assign)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    out = run(logits, coord, labels, centers, valid, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(logits, coord, labels, centers, valid, key)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"matcher (BL={B * L}, Q={Q}, K={K}, n_valid={n_valid}): "
          f"{dt / iters * 1e3:.3f} ms/call")


def bench_train_parts(batch_size, dtype, iters):
    import dataclasses
    from __graft_entry__ import _batch, _flagship_model
    from parq_tpu.train import (LossConfig, create_train_state,
                                make_optimizer)
    from parq_tpu.train.train_step import forward_and_loss
    import optax

    model = _flagship_model()
    model = dataclasses.replace(model, compute_dtype=dtype)
    batch = _batch(model, batch_size)
    tx = make_optimizer(lambda s: 1e-4, grad_clip=1.0)
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    cfg = LossConfig()
    key = jax.random.PRNGKey(1)

    def grad_only(params, frozen, batch, key):
        def loss_fn(p):
            losses, _ = forward_and_loss(state.apply_fn, p, frozen, batch,
                                         key, cfg, deterministic=False)
            return losses["total_loss"]
        return jax.grad(loss_fn)(params)

    def fwd_loss_only(params, frozen, batch, key):
        losses, _ = forward_and_loss(state.apply_fn, params, frozen, batch,
                                     key, cfg, deterministic=False)
        return losses["total_loss"]

    def fwd_only(params, frozen, batch, key):
        outputs = state.apply_fn({"params": params, "frozen": frozen},
                                 batch, deterministic=False,
                                 rngs={"dropout": key})
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), outputs, 0.0)

    for name, fn in [("fwd", fwd_only), ("fwd+loss", fwd_loss_only),
                     ("grad", grad_only)]:
        jfn = jax.jit(fn)
        out = jfn(state.params, state.frozen, batch, key)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(state.params, state.frozen, batch, key)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"{name:>9}: {dt / iters * 1e3:.1f} ms/call")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="matcher",
                    choices=["matcher", "parts"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--n-valid", type=int, default=10)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    if args.mode == "matcher":
        bench_matcher(args.batch, args.layers, 256, 100, args.n_valid,
                      args.iters)
    else:
        bench_train_parts(args.batch, args.dtype, max(args.iters // 4, 3))
