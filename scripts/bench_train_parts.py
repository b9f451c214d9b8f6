#!/usr/bin/env python
"""Train-step decomposition on the real TPU with the fori-loop protocol:
  fwd            — forward only (sum of outputs)
  grad-model     — backward of the bare model (no loss): isolates the
                   backbone/decoder/sampler VJPs
  loss-fixed     — fwd + set_loss with matcher SKIPPED (fixed assignment)
  loss-full      — fwd + matcher + set_loss
  grad-fixed     — backward of loss-fixed
  grad-full      — backward of loss-full (== the train step sans optimizer)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import dataclasses

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of variants")
    ap.add_argument("--batched-grad", default=None, choices=["on", "off"],
                    help="override the decoder batched-gradient path")
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from __graft_entry__ import _batch, _flagship_model
    from parq_tpu.geometry import Obb3D, Pose
    from parq_tpu.losses import parse_targets
    from parq_tpu.losses.set_loss import Targets, set_loss
    from parq_tpu.ops.hungarian import MatchResult
    from parq_tpu.train import LossConfig, create_train_state, make_optimizer

    model = _flagship_model()
    model = dataclasses.replace(model, compute_dtype=args.dtype)
    if args.batched_grad is not None:
        model = dataclasses.replace(model,
                                    batched_grad=args.batched_grad == "on")
    batch = _batch(model, args.batch)
    tx = make_optimizer(lambda s: 1e-4)
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    iters = args.iters

    targets = parse_targets(Obb3D(batch["obbs_padded"]),
                            Pose(batch["T_world_local"]), batch.get("sym"))

    def fwd(params, k):
        return state.apply_fn({"params": params, "frozen": state.frozen},
                              batch, deterministic=False,
                              rngs={"dropout": k})

    def out_sum(params, k):
        out = fwd(params, k)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    def loss_of(params, k, fixed_assign: bool):
        out = fwd(params, k)
        if fixed_assign:
            import parq_tpu.ops.hungarian as hung
            orig = hung.match_batch

            def fake_match(logits, coord, labels, centers, valid, kk, **kw):
                Q = logits.shape[1]
                K = labels.shape[1]
                assign = jnp.where(jnp.arange(Q)[None, :] < K,
                                   jnp.arange(Q)[None, :] % K, -1)
                assign = jnp.where(
                    jnp.take_along_axis(valid, jnp.clip(assign, 0, K - 1),
                                        axis=1) & (assign >= 0), assign, -1)
                assign = jnp.broadcast_to(assign, (logits.shape[0], Q))
                return MatchResult(assign, assign >= 0,
                                   jnp.ones_like(assign, bool))
            hung.match_batch = fake_match
            try:
                import parq_tpu.losses.set_loss as sl
                sl.match_batch = fake_match
                losses = set_loss(out, targets, k)
            finally:
                hung.match_batch = orig
                sl.match_batch = orig
        else:
            losses = set_loss(out, targets, k)
        return losses["total_loss"]

    def loop_scalar(fn):
        @jax.jit
        def run(params, k):
            def body(i, acc):
                return acc + fn(params, jax.random.fold_in(k, i))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return run

    def loop_grad(fn):
        g = jax.grad(fn)

        @jax.jit
        def run(params, k):
            def body(i, acc):
                gr = g(params, jax.random.fold_in(k, i))
                return acc + sum(jnp.sum(x.astype(jnp.float32))
                                 for x in jax.tree_util.tree_leaves(gr))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return run

    variants = {
        "fwd": loop_scalar(out_sum),
        "loss-fixed": loop_scalar(lambda p, k: loss_of(p, k, True)),
        "loss-full": loop_scalar(lambda p, k: loss_of(p, k, False)),
        "grad-model": loop_grad(out_sum),
        "grad-fixed": loop_grad(lambda p, k: loss_of(p, k, True)),
        "grad-full": loop_grad(lambda p, k: loss_of(p, k, False)),
    }
    only = set(args.only.split(",")) if args.only else None
    for name, run in variants.items():
        if only and name not in only:
            continue
        out = run(state.params, key)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(state.params, key)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"{name:>11}: {dt / iters * 1e3:8.1f} ms/step")


if __name__ == "__main__":
    main()
