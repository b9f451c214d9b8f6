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


@pytest.mark.slow  # 151s — the full fit→validate→resume integration pass;
# the loop's semantics stay covered fast by the limited-validate and
# val-subset tests below plus test_train.py's step/checkpoint tests
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


@pytest.mark.slow
def test_restore_best_after_fit(smoke_cfg):
    from parq_tpu.train.loop import Trainer

    trainer = Trainer(smoke_cfg)
    train_loader, val_loader = build_loaders(smoke_cfg)
    trainer.fit(train_loader, val_loader)
    # val ran at least once during fit -> a best-by-0.5_f1 ckpt exists
    assert trainer.restore_best()


def test_strict_load_key_mismatch():
    from parq_tpu.train.checkpoint import _strict_diff
    dst = {"a": {"w": 1, "b": 2}, "c": 3}
    assert _strict_diff(dst, {"a": {"w": 1, "b": 2}, "c": 3}, "params") == []
    probs = _strict_diff(dst, {"a": {"w": 1}}, "params")
    assert any(p.startswith("missing") for p in probs)
    probs = _strict_diff(dst, {"a": {"w": 1, "b": 2}, "c": 3, "x": 9},
                         "params")
    assert any(p.startswith("unexpected") for p in probs)


@pytest.mark.slow
def test_image_logging_renders_pred_gt_and_features(smoke_cfg):
    """GT wireframes + PCA feature maps (VERDICT L8): the logging step
    exposes the sown feature map and the GT renderer produces an image."""
    import jax
    from parq_tpu.train.loop import Trainer, to_device_batch
    from parq_tpu.utils.vis import pca_compress

    trainer = Trainer(smoke_cfg)
    train_loader, _ = build_loaders(smoke_cfg)
    first = next(iter(train_loader))
    train_loader.position = 0
    trainer.setup_state(first, steps_per_epoch=len(train_loader))
    dev = to_device_batch(first)

    outputs, feat = trainer._logging_step()(trainer.state, dev)
    assert feat.ndim == 5  # (B, T, h, w, C)
    assert "pred_logits" in outputs

    gt_img = trainer._render_gt_boxes(dev)
    assert gt_img.ndim == 3 and gt_img.shape[2] == 3

    pca = pca_compress(np.asarray(feat[0, 0], np.float32))
    assert pca.shape == tuple(feat.shape[2:4]) + (3,)


@pytest.mark.slow
def test_seed_determinism(smoke_cfg):
    """Same seed → bit-identical training trajectory (SURVEY §5 debug
    discipline: determinism is the TPU-native sanitizer)."""
    import jax
    from parq_tpu.train.loop import Trainer, to_device_batch

    def one_step_params(workdir):
        trainer = Trainer(smoke_cfg, workdir=workdir)
        train_loader, _ = build_loaders(smoke_cfg)
        first = next(iter(train_loader))
        train_loader.position = 0
        trainer.setup_state(first, steps_per_epoch=len(train_loader))
        rng = jax.random.PRNGKey(smoke_cfg.SEED + 17)
        _, sub = jax.random.split(rng)
        dev = to_device_batch(first)
        state, metrics = trainer.train_step_fn(trainer.state, dev, sub)
        return state.params, float(metrics["total_loss"])

    p1, l1 = one_step_params(smoke_cfg.LOG_PATH + "/det_a")
    p2, l2 = one_step_params(smoke_cfg.LOG_PATH + "/det_b")
    assert l1 == l2
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_limited_validate_scores_same_subset_every_run(smoke_cfg):
    """validate(limit_batches<full) must restart the val loader each run —
    otherwise successive mid-training validations rotate through the val
    set and the top-k checkpoint monitor compares F1 on different data
    (Lightning restarts the val dataloader per run)."""
    from parq_tpu.data.scannet import SnippetLoader
    from parq_tpu.data.synthetic import SyntheticDataset
    from parq_tpu.train.loop import Trainer

    val = SnippetLoader(
        SyntheticDataset(8, image_size=tuple(smoke_cfg.TPU.IMAGE_SIZE),
                         seed=100),
        batch_size=2, shuffle=False, drop_last=False, seed=0)
    trainer = Trainer(smoke_cfg)
    first = next(iter(val))
    val.position = 0
    trainer.setup_state(first, steps_per_epoch=1)

    m1 = trainer.validate(val, limit_batches=2, verbose=False)
    m2 = trainer.validate(val, limit_batches=2, verbose=False)
    # identical params + identical (restarted) subset → identical loss
    np.testing.assert_allclose(m1["total_loss"], m2["total_loss"],
                               rtol=0, atol=0)


def test_limit_val_batches_lightning_semantics(smoke_cfg):
    """Lightning LIMIT_VAL_BATCHES: 0/0.0 runs NO validation batches
    (not "unlimited"); a small positive fraction runs at least one."""
    from parq_tpu.data.scannet import SnippetLoader
    from parq_tpu.data.synthetic import SyntheticDataset
    from parq_tpu.train.loop import Trainer

    val = SnippetLoader(
        SyntheticDataset(4, image_size=tuple(smoke_cfg.TPU.IMAGE_SIZE),
                         seed=100),
        batch_size=2, shuffle=False, drop_last=False, seed=0)
    trainer = Trainer(smoke_cfg)
    first = next(iter(val))
    val.position = 0
    trainer.setup_state(first, steps_per_epoch=1)

    assert trainer.validate(val, limit_batches=0.0, verbose=False) == {}
    m = trainer.validate(val, limit_batches=0.01, verbose=False)
    assert "total_loss" in m  # fraction > 0 → at least one batch
