#!/usr/bin/env python
"""A/B the two fori-loop bench protocols on the full model to explain the
ablation-vs-bench.py discrepancy: (perturbed input x all-leaf sum) grid.
"""
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
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    from __graft_entry__ import _batch, _flagship_model

    model = _flagship_model()
    model = dataclasses.replace(model, compute_dtype="bfloat16")
    batch = _batch(model, 8)
    params = model.init(jax.random.PRNGKey(0), batch)
    iters = 10

    def fwd(b):
        return model.apply(params, b)

    def make(perturb: bool, sum_all: bool):
        @jax.jit
        def run(batch):
            def body(i, acc):
                b = dict(batch)
                if perturb:
                    b["rgb_img"] = b["rgb_img"] + (acc * 1e-24).astype(
                        b["rgb_img"].dtype)
                out = fwd(b)
                if sum_all:
                    s = sum(jnp.sum(leaf.astype(jnp.float32))
                            for leaf in jax.tree_util.tree_leaves(out))
                else:
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    s = leaf.reshape(-1)[0].astype(jnp.float32)
                return acc + s
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return run

    for perturb in (False, True):
        for sum_all in (False, True):
            run = make(perturb, sum_all)
            out = run(batch)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = run(batch)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"perturb={int(perturb)} sum_all={int(sum_all)}: "
                  f"{dt:7.2f} ms/step")


if __name__ == "__main__":
    main()
