#!/usr/bin/env python
"""Compute a per-class mean-size table from ARKitScenes 3DOD annotations.

The ScanNet pipeline ships data/average_scan2cad.txt (scan2cad statistics,
ref utils/parq_utils.py:62-88); ARKitScenes has no equivalent, so this script
derives one from the training annotations at dataset build time:

    python scripts/arkit_mean_sizes.py \
        --data ./data/arkitscenes/3dod/Training \
        --out ./data/arkit_mean_sizes.txt

then set MODEL.DECODER.MEAN_SIZE_PATH to the output in configs/arkitscenes.yaml.
Output rows use the same `name: [x y z]` format the table parser consumes,
keyed by the 17 ARKIT_CLASSES names (parq_tpu/data/arkitscenes.py). Box dims
are full extents (2x the annotation's half axesLengths), matching how
Obb3D stores bb3 min/max bounds.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from parq_tpu.data.arkitscenes import ARKIT_CLASSES, ARKIT_CLASS_TO_ID  # noqa: E402


def collect_sizes(data_path: str):
    sums = np.zeros((len(ARKIT_CLASSES), 3), np.float64)
    counts = np.zeros(len(ARKIT_CLASSES), np.int64)
    n_files = 0
    for vid in sorted(os.listdir(data_path)):
        anno_path = os.path.join(data_path, vid, f"{vid}_3dod_annotation.json")
        if not os.path.isfile(anno_path):
            continue
        n_files += 1
        with open(anno_path) as f:
            anno = json.load(f)
        for item in anno.get("data", []):
            label = item.get("label", "")
            if label not in ARKIT_CLASS_TO_ID:
                continue
            cid = ARKIT_CLASS_TO_ID[label]
            dims = np.asarray(
                item["segments"]["obbAligned"]["axesLengths"], np.float64)
            sums[cid] += dims
            counts[cid] += 1
    return sums, counts, n_files


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="ARKitScenes 3DOD split root (e.g. .../Training)")
    ap.add_argument("--out", default="./data/arkit_mean_sizes.txt")
    args = ap.parse_args()

    sums, counts, n_files = collect_sizes(args.data)
    if n_files == 0:
        raise SystemExit(f"no *_3dod_annotation.json found under {args.data}")

    lines = []
    for cid, name in enumerate(ARKIT_CLASSES):
        if counts[cid] == 0:
            print(f"WARNING: class '{name}' has no annotations; "
                  "emitting unit size", file=sys.stderr)
            mean = np.ones(3)
        else:
            mean = sums[cid] / counts[cid]
        lines.append(f"{name}: [{mean[0]:.8f} {mean[1]:.8f} {mean[2]:.8f}] \n")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        f.writelines(lines)
    print(f"wrote {len(lines)} class rows ({int(counts.sum())} boxes from "
          f"{n_files} scenes) to {args.out}")


if __name__ == "__main__":
    main()
