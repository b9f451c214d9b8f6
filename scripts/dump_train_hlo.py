#!/usr/bin/env python
"""Dump the optimized HLO of jax.grad(loss_full) — for mapping profiler
fusion names to source ops (same computation profile_train.py traces)."""
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
    from parq_tpu.geometry import Obb3D, Pose
    from parq_tpu.losses import parse_targets
    from parq_tpu.losses.set_loss import set_loss
    from parq_tpu.train import create_train_state, make_optimizer

    model = _flagship_model()
    model = dataclasses.replace(model, compute_dtype="bfloat16")
    batch = _batch(model, 8)
    tx = make_optimizer(lambda s: 1e-4)
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    targets = parse_targets(Obb3D(batch["obbs_padded"]),
                            Pose(batch["T_world_local"]), batch.get("sym"))

    def loss_full(params, k):
        out = state.apply_fn({"params": params, "frozen": state.frozen},
                             batch, deterministic=False,
                             rngs={"dropout": k})
        return set_loss(out, targets, k)["total_loss"]

    f = jax.jit(jax.grad(loss_full))
    txt = f.lower(state.params, jax.random.PRNGKey(1)).compile().as_text()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_grad_hlo.txt"
    with open(out, "w") as fh:
        fh.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")


if __name__ == "__main__":
    main()
