#!/usr/bin/env python
"""Parse scan2cad full_annotations.json into per-scene oriented-box pickles.

Offline step 1 (ref: scripts/scannet_preprocessing/parse_scan2cad.py):
for every scene, emit `{scene}.pkl` containing the aligned CAD boxes —
T_scan_object (4x4), box extents (bbox half-extents × 2 × scale), corners,
semantic label, and the symmetry tag.

Usage:
    python parse_scan2cad.py --scan2cad full_annotations.json --out anno_dir
"""
import argparse
import json
import os
import pickle

import numpy as np

from processing_utils import make_corners, synset_to_label, tqs_to_matrix


def generate_anno(scan2cad_path: str, out_dir: str):
    with open(scan2cad_path) as f:
        annotations = json.load(f)
    os.makedirs(out_dir, exist_ok=True)

    for scene_anno in annotations:
        scene_id = scene_anno["id_scan"]
        # T_scan_world: scan2cad gives world→scan alignment of the scan
        trs = scene_anno["trs"]
        T_world_scan = tqs_to_matrix(trs["translation"], trs["rotation"],
                                     trs["scale"])
        T_scan_world = np.linalg.inv(T_world_scan)

        boxes, poses, labels, syms, corners = [], [], [], [], []
        for model in scene_anno["aligned_models"]:
            mtrs = model["trs"]
            scale = np.asarray(mtrs["scale"], np.float64)
            T_world_object = tqs_to_matrix(mtrs["translation"],
                                           mtrs["rotation"], mtrs["scale"])
            T_scan_object = T_scan_world @ T_world_object
            # bbox: CAD half-extents scaled → [xmin,xmax,ymin,ymax,zmin,zmax]
            half = np.asarray(model["bbox"], np.float64) * scale
            center = np.asarray(model.get("center", [0, 0, 0]),
                                np.float64) * scale
            bbox = np.array([
                center[0] - half[0], center[0] + half[0],
                center[1] - half[1], center[1] + half[1],
                center[2] - half[2], center[2] + half[2],
            ])
            boxes.append(bbox)
            poses.append(T_scan_object)
            labels.append(synset_to_label(model["catid_cad"]))
            syms.append(model.get("sym", "__SYM_NONE"))
            corners.append(make_corners(bbox))

        with open(os.path.join(out_dir, f"{scene_id}.pkl"), "wb") as f:
            pickle.dump({
                "scene_id": scene_id,
                "bboxes": np.asarray(boxes),
                "T_scan_object": np.asarray(poses),
                "label": np.asarray(labels, np.int64),
                "sym": syms,
                "corners": np.asarray(corners),
            }, f)
        print(f"{scene_id}: {len(boxes)} boxes")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan2cad", required=True,
                    help="path to full_annotations.json")
    ap.add_argument("--out", required=True, help="output directory")
    args = ap.parse_args()
    generate_anno(args.scan2cad, args.out)
