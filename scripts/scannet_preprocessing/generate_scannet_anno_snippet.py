#!/usr/bin/env python
"""Generate ScanNet snippet annotations (offline step 2).

Re-derivation of ref scripts/scannet_preprocessing/
generate_scannet_anno_snippet.py: per scene, read all camera poses, select
keyframes (≥15° rotation or ≥0.1 m translation between kept frames), group
into windows of 3 (train: overlap-shifted; val: non-overlapping; plus w1 /
allframes variants), score per-frame object difficulty from depth-
backprojected point counts inside each box and FOV truncation, and emit:
  image_anno_{scene}.pkl, scene_anno/{scene}.pkl,
  scannet_{split}_gt_roidb.pkl (objects with difficulty ≥ 3 dropped).

Parallelism: multiprocessing pool sharded round-robin over scenes (the
reference used Ray actors + CUDA; numpy on host is ample offline).

Expected raw layout per scene (ScanNet exports):
  {scans}/{scene}/pose/{frame}.txt        4x4 world_from_camera
  {scans}/{scene}/intrinsic/intrinsic_color.txt (or depth)
  {scans}/{scene}/depth/{frame}.png       uint16 mm (optional: difficulty)
  {scan2cad_anno}/{scene}.pkl             from parse_scan2cad.py
"""
import argparse
import multiprocessing as mp
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from processing_utils import (depth_to_points, difficulty_level,  # noqa: E402
                              make_corners, points_in_obb, select_keyframes,
                              split_list, truncation_ratio, view_selection)


def read_pose(path):
    return np.loadtxt(path).reshape(4, 4)


def read_depth(path):
    from PIL import Image
    return np.asarray(Image.open(path), np.float32) / 1000.0


def list_frames(scene_dir):
    pose_dir = os.path.join(scene_dir, "pose")
    ids = sorted(int(f.split(".")[0]) for f in os.listdir(pose_dir)
                 if f.endswith(".txt"))
    return ids


def process_scene(scans_dir, anno_dir, scene, variant, window,
                  use_depth=True, image_size=(1296, 968)):
    scene_dir = os.path.join(scans_dir, scene)
    anno_path = os.path.join(anno_dir, f"{scene}.pkl")
    if not os.path.exists(anno_path):
        return None
    with open(anno_path, "rb") as f:
        boxes = pickle.load(f)

    frame_ids = list_frames(scene_dir)
    poses = {}
    for i in frame_ids:
        T = read_pose(os.path.join(scene_dir, "pose", f"{i}.txt"))
        if np.all(np.isfinite(T)):
            poses[i] = T
    frame_ids = [i for i in frame_ids if i in poses]
    if not frame_ids:
        return None

    intr_path = os.path.join(scene_dir, "intrinsic", "intrinsic_color.txt")
    intrinsic = np.loadtxt(intr_path)[:3, :3] if os.path.exists(intr_path) \
        else np.array([[1170.0, 0, 648], [0, 1170.0, 484], [0, 0, 1]])

    kept_local = select_keyframes([poses[i] for i in frame_ids])
    kept = [frame_ids[k] for k in kept_local]
    snippets = view_selection(kept, window=window, variant=variant)

    n_box = len(boxes["bboxes"])
    scene_out = {}
    for sid, frames in enumerate(snippets):
        # per-snippet difficulty: worst frame score per object
        difficulties = np.zeros(n_box, np.int64)
        for b in range(n_box):
            bbox = boxes["bboxes"][b]
            T_so = boxes["T_scan_object"][b]
            corners_w = (make_corners(bbox) @ T_so[:3, :3].T) + T_so[:3, 3]
            counts, truncs = [], []
            for fi in frames:
                trunc = truncation_ratio(corners_w, intrinsic, poses[fi],
                                         image_size[0], image_size[1])
                n_in = 0
                if use_depth:
                    dpath = os.path.join(scene_dir, "depth", f"{fi}.png")
                    if os.path.exists(dpath):
                        pts = depth_to_points(read_depth(dpath), intrinsic,
                                              poses[fi])
                        n_in = int(points_in_obb(pts, bbox, T_so).sum())
                    else:
                        n_in = 2000  # no depth → assume visible
                else:
                    n_in = 2000
                counts.append(n_in)
                truncs.append(trunc)
            difficulties[b] = difficulty_level(max(counts), min(truncs))

        keep = difficulties < 3
        scene_out[sid] = {
            "image_ids": frames,
            "T_scan_camera": [poses[fi] for fi in frames],
            "intrinsic": [intrinsic] * len(frames),
            "annotations": {
                "bboxes": np.asarray(boxes["bboxes"])[keep],
                "T_scan_object": np.asarray(boxes["T_scan_object"])[keep],
                "label": np.asarray(boxes["label"])[keep].astype(np.float64),
                "sym": [boxes["sym"][i] for i in np.where(keep)[0]],
                "difficulty": difficulties[keep],
            },
        }
    return scene, scene_out


def worker(args):
    return process_scene(*args)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", required=True, help="ScanNet scans directory")
    ap.add_argument("--anno", required=True,
                    help="parse_scan2cad.py output directory")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--split", default="train", choices=["train", "val"])
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
            scenes = [l.strip() for l in f if l.strip()]
    else:
        scenes = sorted(os.listdir(args.scans))

    os.makedirs(os.path.join(args.out, "scene_anno"), exist_ok=True)
    work = [(args.scans, args.anno, s, variant, args.window,
             not args.no_depth) for s in scenes]

    if args.workers > 1:
        with mp.Pool(args.workers) as pool:
            results = pool.map(worker, work)
    else:
        results = [worker(w) for w in work]

    roidb = []
    for res in results:
        if res is None:
            continue
        scene, scene_out = res
        with open(os.path.join(args.out, "scene_anno", f"{scene}.pkl"),
                  "wb") as f:
            pickle.dump(scene_out, f)
        for sid in scene_out:
            roidb.append({"scene_name": scene, "snippet_id": sid})

    out_pkl = os.path.join(args.out, f"scannet_{args.split}_gt_roidb.pkl")
    with open(out_pkl, "wb") as f:
        pickle.dump(roidb, f)
    print(f"wrote {len(roidb)} snippets to {out_pkl}")


if __name__ == "__main__":
    main()
