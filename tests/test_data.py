"""Data pipeline tests against a fake on-disk ScanNet/demo layout."""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from parq_tpu.data import (DemoDataset, ScanNetDataset, SnippetLoader,
                           camera_to_gravity_aligned, collate, mat_to_pose12,
                           pose12_compose, pose12_inverse, snippet_transform)


def rand_pose(rng, forward=None):
    """4x4 world_from_camera with a non-degenerate forward axis."""
    T = np.eye(4)
    # build a rotation whose z (forward) is not parallel to world up
    f = forward if forward is not None else _normalize(
        rng.randn(3) + np.array([1.0, 1.0, 0.2]))
    up = np.array([0.0, 0.0, 1.0])
    x = _normalize(np.cross(up, f))
    y = np.cross(f, x)
    T[:3, :3] = np.stack([x, y, f], axis=1)
    T[:3, 3] = rng.randn(3)
    return T


def _normalize(v):
    return v / np.linalg.norm(v)


def test_gravity_alignment_properties(rng):
    T_wc = np.stack([rand_pose(rng) for _ in range(3)])
    T_wp = camera_to_gravity_aligned(T_wc, np.array([0.0, 0.0, 1.0]))
    # same origin
    np.testing.assert_allclose(T_wp[:, :3, 3], T_wc[:, :3, 3])
    # y column == world up (gravity aligned)
    np.testing.assert_allclose(T_wp[:, :3, 1], [[0, 0, 1]] * 3, atol=1e-6)
    # orthonormal
    RtR = np.einsum("tij,tik->tjk", T_wp[:, :3, :3], T_wp[:, :3, :3])
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (3, 3, 3)),
                               atol=1e-6)
    # forward (z col) is the camera forward projected to horizontal
    fwd = T_wc[:, :3, 2].copy()
    fwd[:, 2] = 0
    fwd /= np.linalg.norm(fwd, axis=1, keepdims=True)
    np.testing.assert_allclose(T_wp[:, :3, 2], fwd, atol=1e-6)


def test_snippet_transform_consistency(rng):
    T = 3
    imgs = [Image.fromarray((rng.rand(48, 64, 3) * 255).astype(np.uint8))
            for _ in range(T)]
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    T_wc = np.stack([rand_pose(rng) for _ in range(T)])
    out = snippet_transform(imgs, [K] * T, T_wc, image_size=(32, 24))
    assert out["rgb_img"].shape == (T, 24, 32, 3)
    assert out["rgb_img"].max() <= 1.0
    # intrinsics rescaled by 0.5
    np.testing.assert_allclose(out["camera"][0], [32, 24, 25, 25, 16, 12])
    # pose composition: twc ∘ tcp == twp
    recon = pose12_compose(out["T_world_camera"], out["T_camera_pseudoCam"])
    np.testing.assert_allclose(recon, out["T_world_pseudoCam"], atol=1e-5)
    # local frame == middle pseudoCam
    np.testing.assert_allclose(out["T_world_local"][0],
                               out["T_world_pseudoCam"][1], atol=1e-6)


def test_pad_scannet_only_on_1296x968(rng):
    from parq_tpu.data import pad_scannet
    img = Image.new("RGB", (1296, 968))
    K = np.array([[1170.0, 0, 647], [0, 1170.0, 483], [0, 0, 1]])
    img2, K2 = pad_scannet(img, K)
    assert img2.size == (1296, 972)
    assert K2[1, 2] == 485
    img3, K3 = pad_scannet(Image.new("RGB", (64, 48)), K)
    assert img3.size == (64, 48) and K3[1, 2] == 483


@pytest.fixture
def fake_scannet(tmp_path, rng):
    """Two scenes × two snippets with the reference's on-disk layout."""
    root = tmp_path / "scans"
    anno_dir = tmp_path / "anno"
    (anno_dir / "scene_anno").mkdir(parents=True)
    roidb = []
    for s in range(2):
        scene = f"scene{s:04d}_00"
        (root / scene / "color").mkdir(parents=True)
        scene_annos = {}
        for snip in range(2):
            ids = [snip * 3 + k for k in range(3)]
            for i in ids:
                Image.fromarray(
                    (rng.rand(48, 64, 3) * 255).astype(np.uint8)).save(
                    root / scene / "color" / f"frame-{i:06d}.color.jpg")
            n_box = 2
            scene_annos[snip] = {
                "image_ids": ids,
                "T_scan_camera": [rand_pose(rng) for _ in ids],
                "intrinsic": [np.array([[50.0, 0, 32], [0, 50.0, 24],
                                        [0, 0, 1.0]])] * 3,
                "annotations": {
                    "bboxes": np.array([[-.5, .5, -.4, .4, -.3, .3]] * n_box),
                    "T_scan_object": np.stack([np.eye(4)] * n_box),
                    "label": np.arange(n_box, dtype=np.float64),
                    "sym": ["__SYM_NONE", "__SYM_ROTATE_UP_4"],
                },
            }
            roidb.append({"scene_name": scene, "snippet_id": snip})
        with open(anno_dir / "scene_anno" / f"{scene}.pkl", "wb") as f:
            pickle.dump(scene_annos, f)
    gt_path = anno_dir / "roidb.pkl"
    with open(gt_path, "wb") as f:
        pickle.dump(roidb, f)
    return str(root), str(gt_path)


def test_scannet_dataset_and_loader(fake_scannet):
    root, gt_path = fake_scannet
    ds = ScanNetDataset(root, gt_path, num_frames_per_snippet=3,
                        image_size=(32, 24))
    assert len(ds) == 4
    item = ds[0]
    assert item["rgb_img"].shape == (3, 24, 32, 3)
    assert item["obbs_padded"].shape == (100, 19)
    assert item["sym"][:2].tolist() == [0, 2]
    assert item["sym"][2] == -1

    loader = SnippetLoader(ds, batch_size=2, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["rgb_img"].shape == (2, 3, 24, 32, 3)
    assert b["camera"].shape == (2, 3, 6)
    assert b["T_world_local"].shape == (2, 1, 12)
    assert len(b["scene_name"]) == 2
    # epoch advanced; next epoch different order (shuffle by epoch seed)
    assert loader.epoch == 1

    # resumable state roundtrip
    loader2 = SnippetLoader(ds, batch_size=2, shuffle=True, seed=0)
    it = iter(loader2)
    next(it)
    state = loader2.state_dict()
    loader3 = SnippetLoader(ds, batch_size=2, shuffle=True, seed=0)
    loader3.load_state_dict(state)
    b2 = next(iter(loader3))
    b1 = next(it)
    np.testing.assert_allclose(b1["rgb_img"], b2["rgb_img"])


def test_frame_subsampling(fake_scannet):
    root, gt_path = fake_scannet
    ds = ScanNetDataset(root, gt_path, num_frames_per_snippet=2,
                        image_size=(32, 24), seed=1)
    item = ds[0]
    assert item["rgb_img"].shape == (2, 24, 32, 3)
    assert item["camera"].shape == (2, 6)


def test_demo_dataset(tmp_path, rng):
    scene = "2023-03-03T19-23-25"
    (tmp_path / scene / "images").mkdir(parents=True)
    ids = [10, 11, 12]
    for i in ids:
        Image.fromarray((rng.rand(48, 64, 3) * 255).astype(np.uint8)).save(
            tmp_path / scene / "images" / f"{i}.jpg")
    frags = [{
        "scene": scene, "fragment_id": 0, "image_ids": ids,
        "extrinsics": np.stack([rand_pose(rng) for _ in ids]),
        "intrinsics": [np.array([[50.0, 0, 32], [0, 50.0, 24],
                                 [0, 0, 1.0]])] * 3,
    }]
    gt = tmp_path / scene / "fragments.pkl"
    with open(gt, "wb") as f:
        pickle.dump(frags, f)
    ds = DemoDataset(str(tmp_path), str(gt), image_size=(32, 24))
    item = ds[0]
    assert item["rgb_img"].shape == (3, 24, 32, 3)
    assert "obbs_padded" not in item
    batch = collate([item])
    assert batch["rgb_img"].shape == (1, 3, 24, 32, 3)


def test_prefetch_loader_matches_sync(tmp_path):
    """Background-prefetch iteration yields identical batches in identical
    order to the synchronous path, and resume semantics are unchanged."""
    import numpy as np
    from parq_tpu.data.scannet import SnippetLoader
    from parq_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(6, image_size=(64, 48), seed=0)
    sync = SnippetLoader(ds, batch_size=2, shuffle=True, seed=5, prefetch=0)
    pre = SnippetLoader(ds, batch_size=2, shuffle=True, seed=5, prefetch=2)
    sync_batches = list(sync)
    pre_batches = list(pre)
    assert len(sync_batches) == len(pre_batches) == 3
    for a, b in zip(sync_batches, pre_batches):
        assert a["snippet_id"] == b["snippet_id"]
        np.testing.assert_array_equal(a["rgb_img"], b["rgb_img"])
    assert sync.epoch == pre.epoch == 1

    # abandoning a prefetching iterator mid-epoch, then resuming
    pre2 = SnippetLoader(ds, batch_size=2, shuffle=True, seed=5, prefetch=2)
    it = iter(pre2)
    first = next(it)
    state = pre2.state_dict()
    assert state["position"] == 1
    pre3 = SnippetLoader(ds, batch_size=2, shuffle=True, seed=5, prefetch=2)
    pre3.load_state_dict(state)
    rest = [b["snippet_id"] for b in pre3]
    sync2 = SnippetLoader(ds, batch_size=2, shuffle=True, seed=5, prefetch=0)
    expect = [b["snippet_id"] for b in sync2]
    assert [first["snippet_id"]] + rest == expect


def test_process_worker_loader_matches_sync():
    """num_workers>0 (multiprocessing decode) yields identical batches in
    identical order to the synchronous path."""
    import numpy as np
    from parq_tpu.data.scannet import SnippetLoader
    from parq_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(6, image_size=(64, 48), seed=0)
    sync = SnippetLoader(ds, batch_size=2, shuffle=True, seed=5, prefetch=0)
    proc = SnippetLoader(ds, batch_size=2, shuffle=True, seed=5,
                         num_workers=2, prefetch=2)
    sync_batches = list(sync)
    proc_batches = list(proc)
    assert len(sync_batches) == len(proc_batches) == 3
    for a, b in zip(sync_batches, proc_batches):
        assert a["snippet_id"] == b["snippet_id"]
        np.testing.assert_array_equal(a["rgb_img"], b["rgb_img"])
    assert sync.epoch == proc.epoch == 1


def test_frame_subsample_epoch_and_process_determinism(fake_scannet):
    """Per-(seed, epoch, item) subsampling: same epoch → same choice from
    any process; different epoch → (generally) different choice."""
    root, gt_path = fake_scannet
    ds = ScanNetDataset(root, gt_path, num_frames_per_snippet=2,
                        image_size=(32, 24), seed=1)
    a = ds[0]["rgb_img"]
    b = ds[0]["rgb_img"]
    np.testing.assert_array_equal(a, b)
    picks = []
    for epoch in range(8):
        ds.set_epoch(epoch)
        picks.append(tuple(np.round(
            ds[0]["rgb_img"].sum(axis=(1, 2, 3)), 4)))
    assert len(set(picks)) > 1
