"""jax.export serving artifact: serialize the jitted eval forward,
deserialize, and call — outputs must match the live model exactly."""
import numpy as np
import jax

from parq_tpu.config import get_cfg


def _smoke_cfg():
    cfg = get_cfg()
    cfg.defrost()
    cfg.merge_from_file("configs/smoke.yaml")
    cfg.freeze()
    return cfg


def test_export_roundtrip():
    from jax import export as jexport
    from scripts.export_model import export_forward

    cfg = _smoke_cfg()
    blob, variables, batch = export_forward(cfg, batch_size=1)
    assert len(blob) > 1000

    reloaded = jexport.deserialize(blob)
    got = reloaded.call(variables, batch)

    from parq_tpu.models import PARQModel
    model = PARQModel.from_config(cfg)
    want = model.apply(variables, batch, deterministic=True)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k], np.float32),
                                   np.asarray(want[k], np.float32),
                                   rtol=0, atol=1e-5, err_msg=k)
