#!/usr/bin/env python
"""Demonstrate that validate()'s host post-processing is pipelined behind
device compute (r3 VERDICT Weak #4 'Done' criterion): run a synthetic
val-scale pass twice — once through the pipelined validate() path
(timing=False) and once strictly serial (timing=True, the reference
latency protocol) — and report wall-clock per batch. Pipelined wall/batch
should approach max(device step, host postproc) instead of their sum."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snippets", type=int, default=192)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--scenes", type=int, default=4,
                    help="distinct scenes (F1 track association grows "
                    "per-scene — more scenes = realistic host load)")
    ap.add_argument("--release", action="store_true",
                    help="release model/image dims (configs/eval.yaml) "
                    "instead of the smoke config")
    ap.add_argument("--cpu", action="store_true",
                    help="force the in-process CPU platform")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    import contextlib
    import io

    from parq_tpu.config import get_cfg
    from parq_tpu.data import SnippetLoader
    from parq_tpu.data.synthetic import SyntheticDataset
    from parq_tpu.train.loop import Trainer

    cfg = get_cfg()
    cfg.merge_from_file("configs/eval.yaml" if args.release
                        else "configs/smoke.yaml")
    cfg.DATAMODULE.BATCH_SIZE = args.batch_size
    cfg.DATAMODULE.NUM_WORKERS = 0
    cfg.LOG_IMAGES = False
    if args.release:
        cfg.DATAMODULE.DATA_PATH = "synthetic"
        cfg.CHECKPOINT_PATH = ""
    if jax.default_backend() == "tpu":
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.freeze()

    ds = SyntheticDataset(num_snippets=args.snippets,
                          image_size=tuple(cfg.TPU.IMAGE_SIZE), seed=1000,
                          scenes=args.scenes)
    trainer = Trainer(cfg, workdir="/tmp/parq_val_pipeline")

    def fresh_loader():
        return SnippetLoader(ds, args.batch_size, shuffle=False,
                             drop_last=False)

    loader = fresh_loader()
    first = next(iter(loader))
    loader.position = 0
    trainer.setup_state(first, steps_per_epoch=max(len(loader), 1))

    # warm the compile
    trainer.validate(fresh_loader(), limit_batches=2)
    n = len(fresh_loader())

    t0 = time.perf_counter()
    trainer.validate(fresh_loader())
    piped = (time.perf_counter() - t0) / n

    with contextlib.redirect_stdout(io.StringIO()):  # per-snippet prints
        t0 = time.perf_counter()
        trainer.validate(fresh_loader(), timing=True)
        serial = (time.perf_counter() - t0) / n

    print(f"batches    : {n} x {args.batch_size}")
    print(f"pipelined  : {piped * 1e3:8.1f} ms/batch")
    print(f"serial     : {serial * 1e3:8.1f} ms/batch")
    print(f"overlap win: {(serial - piped) * 1e3:8.1f} ms/batch "
          f"({100 * (serial - piped) / max(serial, 1e-9):.0f}%)")


if __name__ == "__main__":
    main()
