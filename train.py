#!/usr/bin/env python
"""Train PARQ-TPU.

Usage mirrors the reference CLI (ref: train.py:147-166):
    python train.py --cfg configs/train.yaml [KEY VALUE ...]

Use `DATAMODULE.DATA_PATH synthetic` to train on the built-in synthetic
dataset (no ScanNet needed) — handy for smoke runs and CI.
"""
import argparse
import logging

from parq_tpu.config import apply_platform, get_cfg, update_config


def build_loaders(cfg):
    import jax
    from parq_tpu.data import ScanNetDataset, SnippetLoader
    dm = cfg.DATAMODULE
    # per-host shard of the epoch order (multi-process runs; the
    # DistributedSampler equivalent — ref: train.py:115 replace_sampler_ddp)
    host = dict(process_index=jax.process_index(),
                process_count=jax.process_count(),
                # DATAMODULE.NUM_WORKERS (ref: datasets/scannet_dataset.py:28).
                # NUM_WORKERS<=1 uses the in-process prefetch thread (covers
                # the reference's single worker); >1 decodes batches in that
                # many worker processes
                num_workers=(0 if int(dm.get("NUM_WORKERS", 1)) <= 1
                             else int(dm.NUM_WORKERS)))
    if dm.DATASET == "arkitscenes":
        from parq_tpu.data.arkitscenes import ARKitScenesDataset
        train_ds = ARKitScenesDataset(
            dm.DATA_PATH, num_frames_per_snippet=dm.NUM_FRAMES_PER_SNIPPET,
            image_size=tuple(cfg.TPU.IMAGE_SIZE),
            gravity_aligned=dm.GRAVITY_ALIGNED)
        val_path = dm.VAL_ANNOTATION_PATH or dm.DATA_PATH
        val_ds = ARKitScenesDataset(
            val_path, num_frames_per_snippet=dm.NUM_FRAMES_PER_SNIPPET,
            image_size=tuple(cfg.TPU.IMAGE_SIZE),
            gravity_aligned=dm.GRAVITY_ALIGNED)
        train_loader = SnippetLoader(train_ds, dm.BATCH_SIZE,
                                     shuffle=dm.SHUFFLE, seed=cfg.SEED,
                                     **host)
        val_loader = SnippetLoader(val_ds, dm.BATCH_SIZE, shuffle=False,
                                   drop_last=False, seed=cfg.SEED, **host)
        return train_loader, val_loader
    if dm.DATA_PATH == "synthetic" or dm.DATASET == "synthetic":
        from parq_tpu.data.synthetic import SyntheticDataset
        train_ds = SyntheticDataset(
            num_snippets=dm.get("SYNTHETIC_TRAIN_SIZE", 32),
            image_size=tuple(cfg.TPU.IMAGE_SIZE), seed=0)
        val_ds = SyntheticDataset(
            num_snippets=dm.get("SYNTHETIC_VAL_SIZE", 8),
            image_size=tuple(cfg.TPU.IMAGE_SIZE), seed=1000)
    else:
        train_ds = ScanNetDataset(
            dm.DATA_PATH, dm.TRAIN_ANNOTATION_PATH,
            num_frames_per_snippet=dm.NUM_FRAMES_PER_SNIPPET,
            image_size=tuple(cfg.TPU.IMAGE_SIZE),
            gravity_aligned=dm.GRAVITY_ALIGNED, seed=cfg.SEED)
        val_ds = ScanNetDataset(
            dm.DATA_PATH, dm.VAL_ANNOTATION_PATH,
            num_frames_per_snippet=dm.NUM_FRAMES_PER_SNIPPET,
            image_size=tuple(cfg.TPU.IMAGE_SIZE),
            gravity_aligned=dm.GRAVITY_ALIGNED, seed=cfg.SEED)
    train_loader = SnippetLoader(train_ds, dm.BATCH_SIZE, shuffle=dm.SHUFFLE,
                                 drop_last=True, seed=cfg.SEED, **host)
    val_loader = SnippetLoader(val_ds, dm.BATCH_SIZE, shuffle=False,
                               drop_last=False, seed=cfg.SEED, **host)
    return train_loader, val_loader


def main():
    parser = argparse.ArgumentParser(
        description="TPU-native PARQ training")
    parser.add_argument("--cfg", required=True,
                        help="experiment configure file name")
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="KEY VALUE config overrides")
    args = parser.parse_args()

    cfg = get_cfg()
    update_config(cfg, args)
    logging.basicConfig(level=logging.INFO)
    apply_platform(cfg)

    # multi-host bring-up BEFORE any other jax use (ref: DDP over
    # GPUS x NUM_NODES processes, train.py:103-110)
    from parq_tpu.parallel.multihost import initialize_distributed
    if initialize_distributed(int(cfg.TRAINER.NUM_NODES)):
        import jax
        logging.info("multi-host: process %d/%d, %d global devices",
                     jax.process_index(), jax.process_count(),
                     jax.device_count())
    if cfg.TPU.DEBUG_NANS:
        import jax
        jax.config.update("jax_debug_nans", True)
    logging.info("config:\n%s", cfg)

    from parq_tpu.train.loop import Trainer
    trainer = Trainer(cfg)
    train_loader, val_loader = build_loaders(cfg)
    trainer.fit(train_loader, val_loader)

    # final test + validate on the BEST checkpoint (ref: train.py:129-142)
    if trainer.restore_best():
        logging.info("final eval uses the best-0.5_f1 checkpoint")
    metrics = trainer.validate(val_loader, verbose=True)
    logging.info("final metrics: %s", metrics)


if __name__ == "__main__":
    main()
