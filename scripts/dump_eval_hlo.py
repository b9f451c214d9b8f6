#!/usr/bin/env python
"""Dump the optimized HLO of the (perturbed) eval fori-loop — for mapping
profiler fusion names back to source ops."""
import os
import sys

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

    @jax.jit
    def run(batch):
        def body(i, acc):
            b = dict(batch)
            b["rgb_img"] = b["rgb_img"] + (acc * 1e-24).astype(
                b["rgb_img"].dtype)
            out = fwd(b)
            s = sum(jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree_util.tree_leaves(out))
            return acc + s
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    txt = run.lower(batch).compile().as_text()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/eval_loop_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")


if __name__ == "__main__":
    main()
