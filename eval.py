#!/usr/bin/env python
"""Evaluate / demo PARQ-TPU.

Usage mirrors the reference CLI (ref: eval.py:70-98):
    python eval.py --cfg configs/eval.yaml [--CHECKPOINT_PATH ckpt] [--DEMO]

Prints per-snippet latency plus per-class F1 at IoU {0.25, 0.5, 0.7}.
Supports torch `parq_release.ckpt` checkpoints (converted on the fly) and
orbax checkpoints. `--DEMO` runs the ARKit fragments path with PNG output.
"""
import argparse
import faulthandler
import logging

from parq_tpu.config import apply_platform, get_cfg, update_config

faulthandler.enable(all_threads=True)  # crash diagnosis (ref: eval.py:13-14)


def main():
    parser = argparse.ArgumentParser(description="TPU-native PARQ eval")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--CHECKPOINT_PATH", type=str, default=None)
    # reference wart NOT replicated: `type=bool` makes `--DEMO False`
    # truthy (ref eval.py:84). Accept bare `--DEMO` and `--DEMO True/False`.
    parser.add_argument("--DEMO", nargs="?", const=True, default=False,
                        type=lambda s: str(s).lower() in
                        ("1", "true", "yes", "y"))
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg = get_cfg()
    update_config(cfg, args)
    if args.CHECKPOINT_PATH:
        cfg.defrost(); cfg.CHECKPOINT_PATH = args.CHECKPOINT_PATH; cfg.freeze()
    if args.DEMO:
        cfg.defrost(); cfg.DEMO = True; cfg.freeze()
    logging.basicConfig(level=logging.INFO)
    apply_platform(cfg)

    from parq_tpu.data import DemoDataset, ScanNetDataset, SnippetLoader
    from parq_tpu.train.loop import Trainer, to_device_batch

    dm = cfg.DATAMODULE
    if cfg.DEMO:
        ds = DemoDataset(dm.DATA_PATH, dm.VAL_ANNOTATION_PATH,
                         num_frames_per_snippet=dm.NUM_FRAMES_PER_SNIPPET,
                         image_size=tuple(cfg.TPU.IMAGE_SIZE),
                         gravity_aligned=dm.GRAVITY_ALIGNED)
    elif dm.DATA_PATH == "synthetic":
        from parq_tpu.data.synthetic import SyntheticDataset
        ds = SyntheticDataset(num_snippets=8,
                              image_size=tuple(cfg.TPU.IMAGE_SIZE), seed=1000)
    else:
        ds = ScanNetDataset(dm.DATA_PATH, dm.VAL_ANNOTATION_PATH,
                            num_frames_per_snippet=dm.NUM_FRAMES_PER_SNIPPET,
                            image_size=tuple(cfg.TPU.IMAGE_SIZE),
                            gravity_aligned=dm.GRAVITY_ALIGNED)
    loader = SnippetLoader(ds, dm.BATCH_SIZE, shuffle=False, drop_last=False)

    trainer = Trainer(cfg)
    first = next(iter(loader))
    loader.position = 0
    trainer.setup_state(first, steps_per_epoch=max(len(loader), 1))
    if cfg.CHECKPOINT_PATH:
        from parq_tpu.train import load_pretrained
        trainer.state = load_pretrained(
            trainer.state, cfg.CHECKPOINT_PATH,
            num_heads=cfg.MODEL.DECODER.TRANSFORMER.DEC_HEADS,
            share_weights=cfg.MODEL.DECODER.TRANSFORMER.SHARE_WEIGHTS,
            strict=True)  # eval loads strict (ref: eval.py:28-31)
        logging.info("loaded checkpoint %s", cfg.CHECKPOINT_PATH)

    for_vis = bool(cfg.MODEL.DECODER.FOR_VIS)
    metrics = trainer.validate(
        loader, limit_batches=cfg.TRAINER.LIMIT_VAL_BATCHES, verbose=True,
        timing=True, for_vis=for_vis, vis_dir="demo_vis" if for_vis else None)
    for key, value in metrics.items():
        print(key, value)


if __name__ == "__main__":
    main()
