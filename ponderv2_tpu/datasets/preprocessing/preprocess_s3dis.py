"""Offline S3DIS preprocessing: Stanford3dDataset txt rooms -> .npz dicts.

Reference: /root/reference/ponder/datasets/preprocessing/s3dis/preprocess_s3dis.py.
Each room directory has Annotations/<object>_<i>.txt files (x y z r g b per
line); class comes from the object name prefix; instances from file index.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

CLASS_NAMES = (
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "table",
    "chair", "sofa", "bookcase", "board", "clutter",
)
CLASS2ID = {n: i for i, n in enumerate(CLASS_NAMES)}


def parse_room(room_dir: str, output_root: str):
    area = os.path.basename(os.path.dirname(room_dir))
    room = os.path.basename(room_dir.rstrip("/"))
    ann_files = sorted(glob.glob(os.path.join(room_dir, "Annotations", "*.txt")))
    coords, colors, segments, instances = [], [], [], []
    for inst_id, fn in enumerate(ann_files):
        cls_name = os.path.basename(fn).split("_")[0]
        cls = CLASS2ID.get(cls_name, CLASS2ID["clutter"])
        data = np.loadtxt(fn)
        if data.ndim == 1:
            data = data[None]
        coords.append(data[:, :3].astype(np.float32))
        colors.append(data[:, 3:6].astype(np.float32))
        segments.append(np.full(len(data), cls, np.int64))
        instances.append(np.full(len(data), inst_id, np.int64))
    if not coords:
        return None
    out = dict(
        coord=np.concatenate(coords),
        color=np.concatenate(colors),
        semantic_gt=np.concatenate(segments),
        instance_gt=np.concatenate(instances),
    )
    os.makedirs(os.path.join(output_root, area), exist_ok=True)
    np.savez(os.path.join(output_root, area, f"{room}.npz"), **out)
    return f"{area}/{room}"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True,
                   help="Stanford3dDataset_v1.2_Aligned_Version root")
    p.add_argument("--output_root", required=True)
    args = p.parse_args()
    rooms = sorted(glob.glob(os.path.join(args.dataset_root, "Area_*", "*")))
    for room in rooms:
        if os.path.isdir(room):
            name = parse_room(room, args.output_root)
            if name:
                print(name)


if __name__ == "__main__":
    main()
