#!/usr/bin/env python
"""Scaled-recurrence stress bench (BASELINE.json config #5): 6 views,
16 shared-weight decoder iterations, 28.8k memory tokens, bf16, batch 1.
Reports eval-forward ms/step under the honest loop-variant protocol
(bench.py's measure(): a different whole batch — images AND poses — per
iteration). CLAUDE.md's 15.7 ms/step was measured ad hoc on the r3
kernels; this script makes the number reproducible."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    from bench import measure
    from parq_tpu.data.synthetic import device_batch, make_batch
    from parq_tpu.models import PARQModel

    # configs/scaled_recurrence.yaml decoder/tokenizer dims
    model = PARQModel(
        resnet_name="resnet50", image_size=(320, 240), num_samples=64,
        dec_dim=1024, dec_heads=4, dec_ffn_dim=768, dec_layers=16,
        num_queries=256, num_semcls=9, dropout_rate=0.1,
        scale=(-3.0, 3.0, -2.0, 0.5, 0.25, 5.25),
        ray_points_scale=(-3.0, 3.0, -2.0, 0.5, 0.25, 5.25),
        compute_dtype="bfloat16")
    model = dataclasses.replace(model)
    batch = device_batch(make_batch(list(range(args.batch)),
                                    image_size=model.image_size,
                                    num_views=6))
    params = model.init(jax.random.PRNGKey(0), batch)

    @jax.jit
    def fwd(batch):
        return model.apply(params, batch)

    t0 = time.time()
    fps = measure(fwd, batch, iters=args.iters)
    B, T = batch["rgb_img"].shape[:2]
    ms_per_step = B * T / fps * 1e3
    print(f"scaled recurrence (T=6, L=16, b{args.batch}, bf16): "
          f"{ms_per_step:.2f} ms/step  ({fps:.1f} frames/s; "
          f"wall incl. compile {time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
