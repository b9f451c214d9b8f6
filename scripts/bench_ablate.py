#!/usr/bin/env python
"""Component ablation on the real TPU: backbone / +rayPE / full model /
1-iteration decoder, to locate the next optimization target.
Times with lax.fori_loop inside one jit (axon dispatch ~750us/call)."""
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


def timed(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from __graft_entry__ import _batch, _flagship_model
    from parq_tpu.geometry import Camera, Pose
    from parq_tpu.models.ray_pe import AddRayPE
    from parq_tpu.models.resnet_fpn import ResNetFPN

    model = _flagship_model()
    model = dataclasses.replace(model, compute_dtype=args.dtype)
    batch = _batch(model, args.batch)
    params = model.init(jax.random.PRNGKey(0), batch)
    iters = args.iters

    def loop(fn):
        @jax.jit
        def run(*a):
            def body(i, acc):
                o = fn(*a)
                leaf = jax.tree_util.tree_leaves(o)[0]
                return acc + leaf.reshape(-1)[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return run

    # full model
    full = loop(lambda b: model.apply(params, b))
    print(f"full model : {timed(full, (batch,), iters):8.2f} ms")

    # 1-layer decoder variant
    m1 = dataclasses.replace(model, dec_layers=1)
    p1 = m1.init(jax.random.PRNGKey(0), batch)
    one = loop(lambda b: m1.apply(p1, b))
    print(f"dec_layers=1: {timed(one, (batch,), iters):8.2f} ms")

    # backbone alone
    bb = ResNetFPN(model.resnet_name, 0, False, model.fpn_channels,
                   dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None)
    pbb = bb.init(jax.random.PRNGKey(0), batch["rgb_img"])
    bbf = loop(lambda img: bb.apply(pbb, img))
    print(f"backbone   : {timed(bbf, (batch['rgb_img'],), iters):8.2f} ms")

    # rayPE alone
    rp = AddRayPE(model.tokenizer_out_channels,
                  tuple(model.ray_points_scale), model.num_samples,
                  model.min_depth, model.max_depth, model.feat_size,
                  dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None)
    cam = Camera(jnp.asarray(batch["camera"])).scale(0.25)
    prp = rp.init(jax.random.PRNGKey(0), cam,
                  Pose(batch["T_camera_pseudoCam"]),
                  Pose(batch["T_world_pseudoCam"]),
                  Pose(batch["T_world_local"]))
    rpf = loop(lambda c, a, b, d: rp.apply(prp, Camera(c), Pose(a), Pose(b),
                                           Pose(d)))
    print(f"rayPE      : "
          f"{timed(rpf, (cam.data, batch['T_camera_pseudoCam'], batch['T_world_pseudoCam'], batch['T_world_local']), iters):8.2f} ms")


if __name__ == "__main__":
    main()
