"""ARKitScenes dataset test against a fake official-format layout."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from parq_tpu.data.arkitscenes import (ARKitScenesDataset, read_annotation,
                                       read_pincam, read_traj)


@pytest.fixture
def fake_arkit(tmp_path, rng):
    vid = "41069021"
    fd = tmp_path / vid / f"{vid}_frames"
    (fd / "lowres_wide").mkdir(parents=True)
    (fd / "lowres_wide_intrinsics").mkdir()

    # 9 frames moving along +x with small rotations
    lines = []
    for i in range(9):
        ts = 1000.0 + i * 0.5
        rvec = np.array([0.0, 0.35 * i, 0.0])  # rotate enough to keep frames
        t = np.array([0.0, 0.0, 0.0])
        lines.append(" ".join(map(str, [ts, *rvec, *t])))
        Image.fromarray((rng.rand(48, 64, 3) * 255).astype(np.uint8)).save(
            fd / "lowres_wide" / f"{vid}_{ts:.3f}.png")
        np.savetxt(fd / "lowres_wide_intrinsics" / f"{vid}_{ts:.3f}.pincam",
                   np.array([[64, 48, 50.0, 50.0, 32.0, 24.0]]))
    (fd / "lowres_wide.traj").write_text("\n".join(lines))

    anno = {"data": [{
        "label": "chair",
        "segments": {"obbAligned": {
            "centroid": [0.5, 0.2, 1.5],
            "axesLengths": [0.6, 1.0, 0.6],
            "normalizedAxes": list(np.eye(3).reshape(-1)),
        }},
    }]}
    with open(tmp_path / vid / f"{vid}_3dod_annotation.json", "w") as f:
        json.dump(anno, f)
    return str(tmp_path), vid


def test_traj_and_pincam_parsing(fake_arkit):
    root, vid = fake_arkit
    fd = os.path.join(root, vid, f"{vid}_frames")
    traj = read_traj(os.path.join(fd, "lowres_wide.traj"))
    assert len(traj) == 9
    T = traj["1000.000"]
    np.testing.assert_allclose(T, np.eye(4), atol=1e-9)
    K = read_pincam(os.path.join(fd, "lowres_wide_intrinsics",
                                 f"{vid}_1000.000.pincam"))
    np.testing.assert_allclose(K[0, 0], 50.0)


def test_annotation_parsing(fake_arkit):
    root, vid = fake_arkit
    bb, T, lab = read_annotation(
        os.path.join(root, vid, f"{vid}_3dod_annotation.json"))
    assert bb.shape == (1, 6)
    np.testing.assert_allclose(bb[0], [-0.3, 0.3, -0.5, 0.5, -0.3, 0.3])
    np.testing.assert_allclose(T[0][:3, 3], [0.5, 0.2, 1.5])
    assert lab[0] == 13  # chair


def test_dataset_end_to_end(fake_arkit):
    root, _ = fake_arkit
    ds = ARKitScenesDataset(root, num_frames_per_snippet=3,
                            image_size=(32, 24))
    assert len(ds) >= 1
    item = ds[0]
    assert item["rgb_img"].shape == (3, 24, 32, 3)
    assert item["obbs_padded"].shape == (100, 19)
    assert item["camera"].shape == (3, 6)
    # gravity alignment with y-up world: pseudoCam y column == +y
    R = item["T_world_pseudoCam"][0, :9].reshape(3, 3)
    np.testing.assert_allclose(R[:, 1], [0, 1, 0], atol=1e-6)
    # runs through the model
    import jax
    from parq_tpu.data import collate
    from parq_tpu.models import PARQModel
    from parq_tpu.train.loop import to_device_batch
    model = PARQModel(resnet_name="resnet18", image_size=(32, 24),
                      num_samples=4, fpn_channels=8,
                      tokenizer_out_channels=32, dec_dim=32, dec_heads=4,
                      dec_ffn_dim=16, dec_layers=1, num_queries=4,
                      num_semcls=17)
    batch = to_device_batch(collate([item]))
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert out["pred_logits"].shape == (1, 1, 4, 18)
