"""Golden tests for the offline ScanNet preprocessing toolchain.

Covers VERDICT r2 item 8: the exact view-selection window math (including
the train split's raw-frame-id overlap shifts x10 and the val split's
coupled accumulate-and-reset windows), the difficulty pipeline
(depth-backprojection point counts, FOV truncation, get_level), scan2cad
parsing, and an end-to-end run over a fake 2-scene ScanNet raw layout whose
outputs are pinned AND fed back into ScanNetDataset to prove the generated
pickles are loadable (ref: scripts/scannet_preprocessing/
generate_scannet_anno_snippet.py:139-366, processing_utils.py:352-505,
parse_scan2cad.py:12-97).
"""
import json
import os
import pickle
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "scannet_preprocessing")
sys.path.insert(0, SCRIPTS)

import generate_scannet_anno_snippet as GEN  # noqa: E402
import parse_scan2cad  # noqa: E402
import processing_utils as PU  # noqa: E402


# ---------------------------------------------------------------------------
# helpers: synthetic poses
# ---------------------------------------------------------------------------

def _pose(x=0.0, R=None):
    """T_scan_camera: camera at (x, 0, 0) looking along world +y
    (forward horizontal, so gravity alignment is non-degenerate)."""
    T = np.eye(4)
    if R is None:
        # cam x -> world x, cam y -> world -z (down), cam z -> world +y
        R = np.array([[1.0, 0.0, 0.0],
                      [0.0, 0.0, 1.0],
                      [0.0, -1.0, 0.0]])
    T[:3, :3] = R
    T[:3, 3] = [x, 0.0, 0.0]
    return T


def _dense_poses(n=10, step=0.12):
    """Every consecutive frame moves > min_distance: all frames keyframes."""
    return {i: _pose(x=i * step) for i in range(n)}


def _sparse_poses():
    """12 frames; only 3, 6, 9 move (0.2 m); keyframes = [0, 3, 6, 9]."""
    xs = [0, 0, 0, .2, .2, .2, .4, .4, .4, .6, .6, .6]
    return {i: _pose(x=xs[i]) for i in range(12)}


# ---------------------------------------------------------------------------
# motion test: viewing-direction angle OR translation distance
# ---------------------------------------------------------------------------

def test_moved_translation_threshold():
    a, b = _pose(0.0), _pose(0.05)
    assert not PU._moved(b, a, 15.0, 0.1)   # 5 cm < 10 cm
    assert PU._moved(_pose(0.15), a, 15.0, 0.1)


def test_moved_is_viewing_direction_not_full_rotation():
    """A pure roll about the optical axis keeps the viewing direction, so
    the reference's z-component test reports NO motion (ref:
    processing_utils.py:365-376) — this pins that we kept the reference's
    semantics rather than a trace-based rotation angle."""
    base = _pose(0.0)
    c, s = np.cos(np.radians(40)), np.sin(np.radians(40))
    roll = base[:3, :3] @ np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    assert not PU._moved(_pose(0.0, R=roll), base, 15.0, 0.1)
    # a 20 deg pitch tilts the viewing direction -> moved
    c, s = np.cos(np.radians(20)), np.sin(np.radians(20))
    pitch = base[:3, :3] @ np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    assert PU._moved(_pose(0.0, R=pitch), base, 15.0, 0.1)


# ---------------------------------------------------------------------------
# view-selection window math (pinned hand-computed goldens)
# ---------------------------------------------------------------------------

def test_val_windows_dense():
    """Val: windows accumulate during selection, reset after each full
    window; the unfinished tail is dropped."""
    got = PU.view_selection(_dense_poses(10), window=3, variant="nonoverlap")
    assert got == [[0, 1, 2], [3, 4, 5], [6, 7, 8]]


def test_val_windows_coupled_reset():
    """After a window completes, the NEXT frame starts the next window
    unconditionally (coupled semantics, ref processing_utils.py:352-384):
    frame 7 (unmoved) opens the second window here, which never fills."""
    got = PU.view_selection(_sparse_poses(), window=3, variant="nonoverlap")
    assert got == [[0, 3, 6]]


def test_overlap_windows_dense_dedup():
    """Dense consecutive keyframes: every +i shift duplicates an existing
    window, so dedup collapses to the unshifted set."""
    got = PU.view_selection(_dense_poses(10), window=3, variant="overlap")
    assert got == [[j, j + 1, j + 2] for j in range(8)]


def test_overlap_windows_sparse_shifts():
    """Sparse keyframes [0,3,6,9] over raw ids 0..11: shifts +0..+9 of the
    two base windows, bounded by the scene's last raw id, deduped in
    first-occurrence order (ref: view_selection_overlap,
    processing_utils.py:422-469)."""
    got = PU.view_selection(_sparse_poses(), window=3, variant="overlap")
    assert got == [[0, 3, 6], [3, 6, 9], [1, 4, 7], [4, 7, 10],
                   [2, 5, 8], [5, 8, 11]]


def test_overlap_shift_requires_pose_existence():
    """A shifted window is dropped when any shifted id has no pose."""
    poses = _sparse_poses()
    del poses[4]  # breaks the +1 shift of window [0, 3, 6]
    got = PU.view_selection(poses, window=3, variant="overlap")
    assert [1, 4, 7] not in got
    assert [0, 3, 6] in got and [2, 5, 8] in got


def test_w1_and_allframes():
    poses = _sparse_poses()
    assert PU.view_selection(poses, variant="w1") == [[0], [3], [6], [9]]
    assert PU.view_selection(poses, variant="allframes") == [[0, 3, 6, 9]]
    # val split with window 1 routes to w1 (ref: save_snippet_pkl:151-153)
    assert PU.view_selection(poses, window=1, variant="nonoverlap") == \
        [[0], [3], [6], [9]]


# ---------------------------------------------------------------------------
# scan2cad TQS + corners
# ---------------------------------------------------------------------------

def test_tqs_folds_scale_into_rotation():
    """make_M_from_tqs applies per-axis scale to the rotation columns
    (ref: processing_utils.py:19-29)."""
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]  # 90 deg about z
    T = PU.tqs_to_matrix([1, 2, 3], q, [2, 3, 4])
    R90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    np.testing.assert_allclose(T[:3, :3], R90 @ np.diag([2, 3, 4]),
                               atol=1e-12)
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3])


def test_make_corners_ordering():
    """Reference corner ordering: 0-3 at zmin (x: -++-, y: --++), 4-7 the
    same at zmax (ref: get_corner_by_dims, processing_utils.py:74-86)."""
    c = PU.make_corners(np.array([-1, 1, -2, 2, -3, 3], float))
    ref = np.array([[-1, -2, -3], [1, -2, -3], [1, 2, -3], [-1, 2, -3],
                    [-1, -2, 3], [1, -2, 3], [1, 2, 3], [-1, 2, 3]], float)
    np.testing.assert_array_equal(c, ref)


# ---------------------------------------------------------------------------
# difficulty pipeline units
# ---------------------------------------------------------------------------

def test_get_level_thresholds():
    """Verbatim reference thresholds (ref: get_level,
    processing_utils.py:304-336); trunc_ratio is the VISIBLE fraction."""
    assert PU.get_level(1001, 0.86) == 0
    assert PU.get_level(1000, 0.9) == 1    # not > 1000
    assert PU.get_level(501, 0.71) == 1
    assert PU.get_level(101, 0.51) == 2
    assert PU.get_level(100, 0.9) == 3     # not > 100
    assert PU.get_level(5000, 0.5) == 3    # ratio fails every level


def test_points_inside_corners_strict():
    corners = PU.make_corners(np.array([-1, 1, -1, 1, -1, 1], float))[None]
    pts = np.array([[0, 0, 0],      # inside
                    [0.99, 0.99, 0.99],
                    [1.0, 0, 0],    # on a face: strict test excludes
                    [1.5, 0, 0]])   # outside
    assert PU.points_inside_corners(corners, pts)[0] == 2


def test_fov_truncation_ratio_full_and_clipped():
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 100.0
    K[0, 2], K[1, 2] = 32.0, 24.0
    visible = PU.make_corners(
        np.array([-0.5, 0.5, -0.4, 0.4, 1.75, 2.25]))[None]
    r = PU.fov_truncation_ratio(visible, (48, 64), K)
    np.testing.assert_allclose(r, [1.0])
    # behind the camera: z clamped to 1 m (reference's verbatim clamp),
    # projection spills far outside the image -> small visible fraction
    behind = visible - np.array([0, 0, 5.0])
    assert PU.fov_truncation_ratio(behind, (48, 64), K)[0] < 0.5


def test_depth_to_point_cloud_homogeneous():
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 100.0
    K[0, 2], K[1, 2] = 32.0, 24.0
    depth = np.zeros((2, 2), np.float32)
    depth[0, 1] = 2.0   # (u=1, v=0)
    depth[1, 1] = 1.0   # (u=1, v=1)
    pc = PU.depth_to_point_cloud(depth, K)
    assert pc.shape == (2, 3)  # zero-depth pixels dropped
    want = {(round((1 - 32) / 100 * 2, 6), round((0 - 24) / 100 * 2, 6), 2.0),
            (round((1 - 32) / 100 * 1, 6), round((1 - 24) / 100 * 1, 6), 1.0)}
    got = {tuple(np.round(p, 6)) for p in pc}
    assert got == want


def test_catid_mapping():
    assert PU.catids_to_labels(["03001627", "04379243", "99999999"]) == \
        [0, 1, 8]


# ---------------------------------------------------------------------------
# end-to-end over a fake 2-scene raw layout
# ---------------------------------------------------------------------------

FX, CX, CY = 100.0, 32.0, 24.0
W, H = 64, 48
# depth stream at 2x the color resolution with its own intrinsic, like real
# ScanNet (640x480 depth vs 1296x968 color)
DFX, DCX, DCY = 200.0, 64.0, 48.0
DW, DH = 128, 96


def _write_pgm16(path, arr):
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n65535\n" % (arr.shape[1], arr.shape[0]))
        f.write(arr.astype(">u2").tobytes())


def _make_scene(scans, scene, poses):
    from PIL import Image
    sd = os.path.join(scans, scene)
    for sub in ("pose", "intrinsic", "color", "depth"):
        os.makedirs(os.path.join(sd, sub), exist_ok=True)
    K = np.eye(4)
    K[0, 0] = K[1, 1] = FX
    K[0, 2], K[1, 2] = CX, CY
    np.savetxt(os.path.join(sd, "intrinsic", "intrinsic_color.txt"), K)
    Kd = np.eye(4)
    Kd[0, 0] = Kd[1, 1] = DFX
    Kd[0, 2], Kd[1, 2] = DCX, DCY
    np.savetxt(os.path.join(sd, "intrinsic", "intrinsic_depth.txt"), Kd)
    rng = np.random.RandomState(0)
    depth_mm = np.full((DH, DW), 4000, np.uint16)  # flat wall at 4 m
    for fid, T in poses.items():
        np.savetxt(os.path.join(sd, "pose", f"frame-{fid:06d}.pose.txt"), T)
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
            os.path.join(sd, "color", f"frame-{fid:06d}.color.jpg"))
        _write_pgm16(os.path.join(sd, "depth", f"frame-{fid:06d}.depth.pgm"),
                     depth_mm)


def _scan2cad_json(scenes):
    """Each scene: box A (chair, in front of every camera, easy), box B
    (unknown catid, behind the cameras -> difficulty 3, dropped at roidb),
    box C (degenerate scale -> skipped at parse)."""
    def model(t, catid, bbox, scale=(1, 1, 1)):
        return {"trs": {"translation": list(t), "rotation": [1, 0, 0, 0],
                        "scale": list(scale)},
                "center": [0, 0, 0], "bbox": list(bbox),
                "catid_cad": catid, "id_cad": "cad0",
                "sym": "__SYM_NONE"}
    out = []
    for scene in scenes:
        out.append({
            "id_scan": scene, "n_aligned_models": 3,
            "trs": {"translation": [0, 0, 0], "rotation": [1, 0, 0, 0],
                    "scale": [1, 1, 1]},
            "aligned_models": [
                # cameras look along world +y from x in [0, 1.08]; box A
                # sits on the 4 m depth wall, fully in view from every
                # camera, big enough that >1000 wall points fall inside
                model((0.55, 4.0, 0.0), "03001627", (0.45, 0.25, 0.55)),
                model((0.55, -3.0, 0.0), "99999999", (0.5, 0.25, 0.4)),
                model((0.0, 0.0, 0.0), "03001627", (1, 1, 1),
                      scale=(1e-9, 1, 1)),
            ],
        })
    return out


@pytest.fixture(scope="module")
def fake_raw(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet_raw")
    scans = os.path.join(root, "scans")
    _make_scene(scans, "scene0000_00", _dense_poses(10))
    _make_scene(scans, "scene0001_00", _sparse_poses())
    jpath = os.path.join(root, "full_annotations.json")
    with open(jpath, "w") as f:
        json.dump(_scan2cad_json(["scene0000_00", "scene0001_00"]), f)
    anno = os.path.join(root, "anno")
    parse_scan2cad.generate_anno(jpath, anno)
    return {"root": str(root), "scans": scans, "anno": anno}


def test_parse_scan2cad_output(fake_raw):
    with open(os.path.join(fake_raw["anno"], "scene0000_00.pkl"), "rb") as f:
        d = pickle.load(f)
    assert d["id_scan"] == "scene0000_00"
    models = d["aligned_models"]
    assert len(models) == 2  # degenerate-scale model skipped
    a = models[0]
    # bboxes: [-ex, ex, -ey, ey, -ez, ez] with extents = bbox * scale * 2
    np.testing.assert_allclose(
        a["bboxes"], [-0.45, 0.45, -0.25, 0.25, -0.55, 0.55], atol=1e-12)
    np.testing.assert_allclose(a["T_so"][:3, 3], [0.55, 4.0, 0.0])
    assert a["bbox_corners"].shape == (8, 3)
    np.testing.assert_allclose(a["bbox_corners"].mean(0), [0.55, 4.0, 0.0],
                               atol=1e-12)
    assert a["sym"] == "__SYM_NONE"


def _run_stage12(fake_raw, out, scenes, variant, split):
    os.makedirs(out, exist_ok=True)
    for s in scenes:
        assert GEN.process_scene(fake_raw["scans"], fake_raw["anno"], out,
                                 s, variant, 3) == s
    return GEN.get_roidb(out, split)


def test_end_to_end_val(fake_raw, tmp_path):
    out = str(tmp_path / "val")
    items = _run_stage12(fake_raw, out, ["scene0000_00", "scene0001_00"],
                         "nonoverlap", "val")
    # pinned window goldens: dense scene -> 3 windows, sparse -> 1
    with open(os.path.join(out, "image_anno_scene0000_00.pkl"), "rb") as f:
        s0 = pickle.load(f)
    assert [s["image_ids"] for s in s0["snippets"]] == \
        [[0, 1, 2], [3, 4, 5], [6, 7, 8]]
    with open(os.path.join(out, "image_anno_scene0001_00.pkl"), "rb") as f:
        s1 = pickle.load(f)
    assert [s["image_ids"] for s in s1["snippets"]] == [[0, 3, 6]]

    # difficulty: box A easy (level 0), box B dropped (level 3)
    snip = s0["snippets"][0]
    assert snip["point_cloud_num_list"][0] > 1000   # wall points inside A
    assert snip["point_cloud_num_list"][1] == 0     # B is behind the camera
    assert snip["truncation_ratio_list"][0] > 0.85
    lvl = [PU.get_level(snip["point_cloud_num_list"][i],
                        snip["truncation_ratio_list"][i]) for i in range(2)]
    assert lvl[0] == 0 and lvl[1] == 3

    # roidb: every snippet kept (A survives), only label 0 (chair) remains
    assert len(items) == 4
    with open(os.path.join(out, "scene_anno", "scene0000_00.pkl"),
              "rb") as f:
        anno = pickle.load(f)
    assert sorted(anno.keys()) == [0, 1, 2]
    a0 = anno[0]["annotations"]
    assert a0["label"] == [0]
    assert a0["sym"] == ["__SYM_NONE"]
    assert len(a0["bboxes"]) == 1 and len(a0["T_scan_object"]) == 1
    assert len(anno[0]["T_scan_camera"]) == 3
    assert anno[0]["intrinsic"][0].shape == (4, 4)


def test_end_to_end_train_overlap(fake_raw, tmp_path):
    out = str(tmp_path / "train")
    items = _run_stage12(fake_raw, out, ["scene0000_00", "scene0001_00"],
                         "overlap", "train")
    with open(os.path.join(out, "image_anno_scene0001_00.pkl"), "rb") as f:
        s1 = pickle.load(f)
    assert [s["image_ids"] for s in s1["snippets"]] == \
        [[0, 3, 6], [3, 6, 9], [1, 4, 7], [4, 7, 10], [2, 5, 8], [5, 8, 11]]
    assert len(items) == 8 + 6


def test_generated_pickles_feed_dataloader(fake_raw, tmp_path):
    """Close the loop: preprocessing output -> ScanNetDataset -> collate
    produces model-ready batches (the reference's de-facto contract between
    its offline scripts and datasets/scannet_dataset.py)."""
    out = str(tmp_path / "dl")
    _run_stage12(fake_raw, out, ["scene0000_00", "scene0001_00"],
                 "nonoverlap", "val")
    from parq_tpu.data.scannet import ScanNetDataset, collate
    ds = ScanNetDataset(fake_raw["scans"],
                        os.path.join(out, "scannet_val_gt_roidb.pkl"),
                        num_frames_per_snippet=3, image_size=(64, 48))
    assert len(ds) == 4
    batch = collate([ds[0], ds[1]])
    assert batch["rgb_img"].shape == (2, 3, 48, 64, 3)
    assert batch["camera"].shape == (2, 3, 6)
    assert batch["obbs_padded"].shape[0] == 2
    for k in ("rgb_img", "T_world_pseudoCam", "T_world_local",
              "obbs_padded"):
        assert np.all(np.isfinite(batch[k])), k
    # exactly one real (non-pad) box per snippet, class 0
    obbs = batch["obbs_padded"]
    real = obbs[0][obbs[0][:, -1] >= 0]
    assert real.shape[0] == 1 and real[0, -1] == 0
