"""Config knob resolution: every TRAINER key is honored or rejected loudly
(VERDICT r2 missing #3 — dead knobs)."""
import pytest

from parq_tpu.config import check_config, get_cfg


def test_precision_16_selects_bf16():
    cfg = get_cfg()
    cfg.TRAINER.PRECISION = 16
    check_config(cfg)
    assert cfg.TPU.COMPUTE_DTYPE == "bfloat16"


def test_precision_explicit_tpu_dtype_wins():
    cfg = get_cfg()
    cfg.TRAINER.PRECISION = 16
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    check_config(cfg)
    assert cfg.TPU.COMPUTE_DTYPE == "bfloat16"


def test_precision_default_is_f32():
    cfg = get_cfg()
    check_config(cfg)
    assert cfg.TPU.COMPUTE_DTYPE == "float32"


def test_precision_rejects_unknown():
    cfg = get_cfg()
    cfg.TRAINER.PRECISION = 64
    with pytest.raises(ValueError, match="PRECISION"):
        check_config(cfg)


def test_reload_dataloaders_rejected():
    cfg = get_cfg()
    cfg.TRAINER.RELOAD_DATALOADERS_EVERY_N_EPOCHS = 2
    with pytest.raises(ValueError, match="RELOAD_DATALOADERS"):
        check_config(cfg)


def test_auto_scale_batch_size_rejected_when_enabled():
    cfg = get_cfg()
    cfg.TRAINER.AUTO_SCALE_BATCH_SIZE = "power"
    with pytest.raises(ValueError, match="AUTO_SCALE_BATCH_SIZE"):
        check_config(cfg)


def test_shipped_yamls_pass_check(tmp_path):
    import argparse
    import glob
    from parq_tpu.config import update_config
    for path in glob.glob("configs/*.yaml"):
        cfg = get_cfg()
        args = argparse.Namespace(cfg=path, opts=None)
        update_config(cfg, args)  # must not raise


def test_apply_platform_env_wins_over_config(monkeypatch):
    """PARQ_PLATFORM env overrides TPU.PLATFORM; both fall through to a
    jax.config platform update (the site hook pins JAX_PLATFORMS, so the
    switch must be in-process)."""
    import jax
    from parq_tpu.config import apply_platform, get_cfg
    cfg = get_cfg()
    cfg.defrost()
    cfg.TPU.PLATFORM = "bogus-platform"
    cfg.freeze()
    # env wins: "cpu" is applied (tests already run on cpu — harmless)
    monkeypatch.setenv("PARQ_PLATFORM", "cpu")
    apply_platform(cfg)
    assert jax.config.jax_platforms == "cpu"
    # empty platform: no-op (config value untouched)
    cfg2 = get_cfg()
    monkeypatch.delenv("PARQ_PLATFORM", raising=False)
    apply_platform(cfg2)
    assert jax.config.jax_platforms == "cpu"


def test_seq_parallel_requires_model_axis():
    cfg = get_cfg()
    cfg.TPU.SEQ_PARALLEL = True          # MESH_MODEL left at 1
    with pytest.raises(ValueError, match="MESH_MODEL"):
        check_config(cfg)


def test_seq_parallel_requires_flash():
    cfg = get_cfg()
    cfg.TPU.SEQ_PARALLEL = True
    cfg.TPU.MESH_MODEL = 2
    cfg.TPU.USE_FLASH_CROSS_ATTN = False
    with pytest.raises(ValueError, match="FLASH"):
        check_config(cfg)


def test_seq_parallel_valid_combo_passes():
    cfg = get_cfg()
    cfg.TPU.SEQ_PARALLEL = True
    cfg.TPU.MESH_MODEL = 2
    check_config(cfg)
