"""End-to-end Trainer loop test on the smoke config (synthetic data, CPU)."""
import os

import numpy as np
import pytest

from parq_tpu.config import get_cfg


@pytest.fixture
def smoke_cfg(tmp_path):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "smoke.yaml"))
    cfg.LOG_PATH = str(tmp_path)
    cfg.LOG_IMAGES = False
    cfg.TPU.ASYNC_CHECKPOINTING = False
    cfg.freeze()
    return cfg


def build_loaders(cfg):
    from parq_tpu.data.scannet import SnippetLoader
    from parq_tpu.data.synthetic import SyntheticDataset
    train = SnippetLoader(
        SyntheticDataset(4, image_size=tuple(cfg.TPU.IMAGE_SIZE), seed=0),
        cfg.DATAMODULE.BATCH_SIZE, shuffle=True, seed=0)
    val = SnippetLoader(
        SyntheticDataset(2, image_size=tuple(cfg.TPU.IMAGE_SIZE), seed=100),
        cfg.DATAMODULE.BATCH_SIZE, shuffle=False, drop_last=False, seed=0)
    return train, val


def test_trainer_fit_validate_resume(smoke_cfg):
    from parq_tpu.train.loop import Trainer

    trainer = Trainer(smoke_cfg)
    train_loader, val_loader = build_loaders(smoke_cfg)
    trainer.fit(train_loader, val_loader)
    assert trainer.global_step == 2  # 4 snippets / batch 2 * 1 epoch

    metrics = trainer.validate(val_loader, verbose=False)
    assert "total_loss" in metrics and np.isfinite(metrics["total_loss"])
    assert "0.5_f1" in metrics

    # a fresh Trainer resumes from the saved checkpoint
    trainer2 = Trainer(smoke_cfg)
    t2, v2 = build_loaders(smoke_cfg)
    first = next(iter(t2))
    t2.position = 0
    trainer2.setup_state(first, steps_per_epoch=len(t2))
    assert trainer2.restore_if_available(t2)
    assert int(trainer2.state.step) == 2
    # restored params match
    import jax
    a = jax.tree_util.tree_leaves(trainer.state.params)
    b = jax.tree_util.tree_leaves(trainer2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
