"""Demo FOR_VIS path end-to-end: validate(for_vis=True, vis_dir=...) must
render one wireframe PNG per batch (ref: parq_lightning.py:295-304 saves
`{scene}_{snippet}.png` detection overlays in demo mode)."""
import os

import numpy as np
import pytest

from parq_tpu.config import get_cfg


@pytest.fixture(scope="module")
def smoke_cfg():
    cfg = get_cfg()
    cfg.defrost()
    cfg.merge_from_file("configs/smoke.yaml")
    cfg.MODEL.DECODER.FOR_VIS = True
    cfg.LOG_IMAGES = False
    cfg.freeze()
    return cfg


@pytest.mark.slow
def test_validate_for_vis_writes_pngs(tmp_path, smoke_cfg):
    from PIL import Image

    from parq_tpu.data import SnippetLoader
    from parq_tpu.data.synthetic import SyntheticDataset
    from parq_tpu.train.loop import Trainer

    cfg = smoke_cfg
    ds = SyntheticDataset(num_snippets=2,
                          image_size=tuple(cfg.TPU.IMAGE_SIZE), seed=5)
    loader = SnippetLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    trainer = Trainer(cfg, workdir=str(tmp_path / "work"))
    first = next(iter(loader))
    loader.position = 0
    trainer.setup_state(first, steps_per_epoch=1)

    vis_dir = str(tmp_path / "demo_vis")
    metrics = trainer.validate(loader, verbose=False, for_vis=True,
                               vis_dir=vis_dir)
    pngs = [f for f in os.listdir(vis_dir) if f.endswith(".png")]
    assert pngs, "FOR_VIS produced no PNG output"
    img = np.asarray(Image.open(os.path.join(vis_dir, pngs[0])))
    assert img.ndim == 3 and img.shape[2] in (3, 4)
    assert img.shape[0] > 0 and img.shape[1] > 0
    assert "total_loss" in metrics
