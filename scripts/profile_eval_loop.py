#!/usr/bin/env python
"""Profile the eval fori-loop under the CURRENT bench protocol (whole
batch dynamic-sliced per iteration) and print top device ops by self
time."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import dataclasses

import jax
import jax.numpy as jnp

from trace_utils import print_top


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--hlo-out", default=None,
                    help="also dump THIS program's optimized HLO (for "
                         "scripts/trace_attr.py, which joins trace op "
                         "names with HLO metadata — same program only)")
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    from __graft_entry__ import _batch, _flagship_model

    model = _flagship_model()
    model = dataclasses.replace(model, compute_dtype="bfloat16",
                                use_pallas=not args.no_pallas)
    batch = _batch(model, 8)
    params = model.init(jax.random.PRNGKey(0), batch)
    iters = 10

    def fwd(b):
        return model.apply(params, b)

    @jax.jit
    def run(batch):
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.stack([x, x[::-1]]), batch)

        def body(i, acc):
            b = jax.tree_util.tree_map(
                lambda x2: jax.lax.dynamic_index_in_dim(
                    x2, i % 2, keepdims=False), stacked)
            out = fwd(b)
            s = sum(jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree_util.tree_leaves(out))
            return acc + s
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    out = run(batch)
    jax.block_until_ready(out)
    d = "/tmp/parq_evalloop"
    with jax.profiler.trace(d):
        out = run(batch)
        jax.block_until_ready(out)
    print_top(d, "eval loop (bench protocol)", args.top, calls=iters)
    if args.hlo_out:
        txt = run.lower(batch).compile().as_text()
        with open(args.hlo_out, "w") as fh:
            fh.write(txt)
        print(f"wrote {len(txt)} bytes to {args.hlo_out}")


if __name__ == "__main__":
    main()
