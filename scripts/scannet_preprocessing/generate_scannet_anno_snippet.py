#!/usr/bin/env python
"""Generate ScanNet snippet annotations (offline step 2).

Faithful re-derivation of ref scripts/scannet_preprocessing/
generate_scannet_anno_snippet.py in two stages matching the reference's
intermediate artifacts:

  stage 1 (``--stage snippets``, ref save_snippet_pkl:139-263): per scene,
  read every ``frame-{:06d}.pose.txt``, run view selection (train:
  overlap-shifted windows ×10 over raw frame ids; val: coupled
  non-overlapping windows; plus w1 / allframes), compute per-snippet
  per-object visibility — max over frames of depth-point-in-box counts and
  of FOV truncation ratios — and write ``image_anno_{scene}.pkl``.

  stage 2 (``--stage roidb``, ref get_roidb:266-366): read the image_anno
  pickles, map catids → RayTran class ids, drop objects with difficulty
  ≥ 3, drop snippets with no valid object, and write
  ``scene_anno/{scene}.pkl`` + ``scannet_{split}_gt_roidb.pkl``.

Output pickles are layout-compatible with reference-preprocessed data, so
either toolchain's artifacts feed either framework's dataloader.

Parallelism: multiprocessing pool sharded round-robin over scenes (the
reference used Ray actors + CUDA; vectorized numpy on host is ample).

Expected raw layout per scene (ScanNet .sens exports):
  {scans}/{scene}/pose/frame-{:06d}.pose.txt    4x4 world_from_camera
  {scans}/{scene}/intrinsic/intrinsic_color.txt + intrinsic_depth.txt (4x4)
  {scans}/{scene}/color/frame-{:06d}.color.jpg
  {scans}/{scene}/depth/frame-{:06d}.depth.pgm  uint16 mm
  {anno}/{scene}.pkl                            from parse_scan2cad.py
"""
import argparse
import glob
import multiprocessing as mp
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from processing_utils import (CLASS_TO_INDEX_RAYTRAN,  # noqa: E402
                              catids_to_labels, depth_to_point_cloud,
                              fov_truncation_ratio, get_level,
                              points_inside_corners, view_selection)


def read_depth(path):
    from PIL import Image
    return np.asarray(Image.open(path), np.float32) / 1000.0


def read_scene_poses(scene_dir):
    """All finite frame poses, id-ordered (ref: worker_thread:106-126 —
    the reference indexes poses by color-frame count; non-finite poses are
    skipped)."""
    pose_dir = os.path.join(scene_dir, "pose")
    poses = {}
    for f in sorted(os.listdir(pose_dir)):
        if not f.endswith(".txt"):
            continue
        fid = int(f.replace("frame-", "").split(".")[0])
        T = np.loadtxt(os.path.join(pose_dir, f)).reshape(4, 4)
        if np.all(np.isfinite(T)):
            poses[fid] = T
    return dict(sorted(poses.items()))


def _frame_file(scene_dir, sub, fid, suffix):
    return os.path.join(scene_dir, sub, f"frame-{fid:06d}.{suffix}")


def process_scene(scans_dir, anno_dir, out_dir, scene, variant, window,
                  use_depth=True, image_shape=None):
    """Stage 1 for one scene → image_anno_{scene}.pkl
    (ref: save_snippet_pkl, generate_scannet_anno_snippet.py:139-263)."""
    scene_dir = os.path.join(scans_dir, scene)
    anno_path = os.path.join(anno_dir, f"{scene}.pkl")
    if not os.path.exists(anno_path):
        return None  # no oriented boxes for this scene (ref: :160-166)
    with open(anno_path, "rb") as f:
        scene_anno = pickle.load(f)
    aligned = scene_anno["aligned_models"]
    if not aligned:
        return None

    poses = read_scene_poses(scene_dir)
    if not poses:
        return None
    snippets = view_selection(poses, window=window, variant=variant)

    def intr(name):
        p = os.path.join(scene_dir, "intrinsic", name)
        return np.loadtxt(p).astype(np.float32) if os.path.exists(p) \
            else np.eye(4, dtype=np.float32)

    intr_depth = intr("intrinsic_depth.txt")
    intr_color = intr("intrinsic_color.txt")

    if image_shape is None:
        # reference reads the first color jpg of the first snippet for the
        # image shape (ref: :190-199); fall back to ScanNet's 968x1296
        shape = (968, 1296)
        for frames in snippets[:1]:
            cpath = _frame_file(scene_dir, "color", frames[0], "color.jpg")
            if os.path.exists(cpath):
                from PIL import Image
                shape = np.asarray(Image.open(cpath)).shape[:2]
        image_shape = shape

    corners_scan = np.stack([m["bbox_corners"] for m in aligned])  # (K,8,3)
    K = corners_scan.shape[0]
    hom_corners = np.concatenate([corners_scan, np.ones((K, 8, 1))], -1)

    roidb_scene = {
        "scene_name": scene,
        "bboxes": [m["bboxes"] for m in aligned],
        "sym": [m["sym"] for m in aligned],
        "T_scan_object": [m["T_so"] for m in aligned],
        "labels": [m["catid_cad"] for m in aligned],
        "snippets": [],
    }
    for sid, frames in enumerate(snippets):
        counts, ratios, T_list, intr_list = [], [], [], []
        for fid in frames:
            T_scan_camera = poses[fid]
            T_list.append(T_scan_camera)
            intr_list.append(np.copy(intr_color))
            T_camera_scan = np.linalg.inv(T_scan_camera)
            corners_cam = (hom_corners @ T_camera_scan.T)[..., :3]
            ratios.append(fov_truncation_ratio(corners_cam, image_shape,
                                               intr_color))
            if use_depth:
                dpath = _frame_file(scene_dir, "depth", fid, "depth.pgm")
                if not os.path.exists(dpath):
                    dpath = os.path.join(scene_dir, "depth", f"{fid}.png")
                if os.path.exists(dpath):
                    pc = depth_to_point_cloud(read_depth(dpath), intr_depth)
                    counts.append(points_inside_corners(corners_cam, pc))
                else:
                    # pose exists but depth export is missing for this frame
                    # (train-split overlap windows only require the pose):
                    # assume visible rather than aborting the whole run
                    print(f"WARNING {scene}: no depth for frame {fid}; "
                          "assuming objects visible")
                    counts.append(np.full(K, 10 ** 6))
            else:
                counts.append(np.full(K, 10 ** 6))  # no depth → keep all
        # per-object visibility = BEST frame in the snippet (ref: :243-248)
        roidb_scene["snippets"].append({
            "snippet_id": sid,
            "image_ids": list(frames),
            "intrinsic": intr_list,
            "T_scan_camera": T_list,
            "point_cloud_num_list": np.max(np.stack(counts), axis=0),
            "truncation_ratio_list": np.max(np.stack(ratios), axis=0),
        })

    with open(os.path.join(out_dir, f"image_anno_{scene}.pkl"), "wb") as f:
        pickle.dump(roidb_scene, f)
    return scene


def get_roidb(out_dir, split, scene_filter=None):
    """Stage 2: difficulty-filtered roidb + per-scene annotation pickles
    (ref: get_roidb, generate_scannet_anno_snippet.py:266-366)."""
    scene_anno_path = os.path.join(out_dir, "scene_anno")
    os.makedirs(scene_anno_path, exist_ok=True)
    item_list = []
    for path in sorted(glob.glob(os.path.join(out_dir, "image_anno*"))):
        with open(path, "rb") as f:
            roidb_scene = pickle.load(f)
        scene_name = roidb_scene["scene_name"]
        if scene_filter is not None and scene_name not in scene_filter:
            continue
        ids = catids_to_labels(roidb_scene["labels"])
        bboxes = roidb_scene["bboxes"]
        T_scan_object = roidb_scene["T_scan_object"]
        sym = roidb_scene["sym"]

        item_one_scene = {}
        for snip in roidb_scene["snippets"]:
            pc_nums = snip["point_cloud_num_list"]
            ratios = snip["truncation_ratio_list"]
            valid = [i for i in range(len(bboxes))
                     if pc_nums is None
                     or get_level(pc_nums[i], ratios[i]) < 3]
            if not valid:
                continue  # snippet with no visible object dropped (ref:
                # :332-334)
            item_list.append({"scene_name": scene_name,
                              "snippet_id": snip["snippet_id"]})
            item_one_scene[snip["snippet_id"]] = {
                "image_ids": snip["image_ids"],
                "T_scan_camera": snip["T_scan_camera"],
                "intrinsic": snip["intrinsic"],
                "annotations": {
                    "label": [ids[i] for i in valid],
                    "bboxes": [bboxes[i] for i in valid],
                    "sym": [sym[i] for i in valid],
                    "T_scan_object": [T_scan_object[i] for i in valid],
                },
            }
        with open(os.path.join(scene_anno_path, f"{scene_name}.pkl"),
                  "wb") as f:
            pickle.dump(item_one_scene, f)

    roidb_file = os.path.join(out_dir, f"scannet_{split}_gt_roidb.pkl")
    with open(roidb_file, "wb") as f:
        pickle.dump(item_list, f)
    print(f"wrote {len(item_list)} snippets to {roidb_file}")
    return item_list


def _worker(args):
    return process_scene(*args)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", required=True, help="ScanNet scans directory")
    ap.add_argument("--anno", required=True,
                    help="parse_scan2cad.py output directory")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--split", default="train", choices=["train", "val"])
    ap.add_argument("--stage", default="all",
                    choices=["all", "snippets", "roidb"])
    ap.add_argument("--variant", default=None,
                    choices=[None, "overlap", "nonoverlap", "w1",
                             "allframes"])
    ap.add_argument("--window", type=int, default=3)
    ap.add_argument("--workers", type=int, default=os.cpu_count())
    ap.add_argument("--no-depth", action="store_true",
                    help="skip depth-based difficulty (all boxes kept)")
    ap.add_argument("--scene-list", default=None,
                    help="file with one scene id per line (default: all)")
    args = ap.parse_args()

    variant = args.variant or ("overlap" if args.split == "train"
                               else "nonoverlap")
    if args.scene_list:
        with open(args.scene_list) as f:
            scenes = [ln.strip() for ln in f if ln.strip()]
    else:
        scenes = sorted(os.listdir(args.scans))

    os.makedirs(args.out, exist_ok=True)
    if args.stage in ("all", "snippets"):
        work = [(args.scans, args.anno, args.out, s, variant, args.window,
                 not args.no_depth) for s in scenes]
        if args.workers > 1:
            with mp.Pool(args.workers) as pool:
                done = pool.map(_worker, work)
        else:
            done = [_worker(w) for w in work]
        print(f"stage snippets: {sum(d is not None for d in done)}/"
              f"{len(scenes)} scenes")
    if args.stage in ("all", "roidb"):
        get_roidb(args.out, args.split,
                  scene_filter=set(scenes) if args.scene_list else None)


if __name__ == "__main__":
    main()
