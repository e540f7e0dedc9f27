"""Offline preprocessing CLIs driven on synthetic fixtures.

Structured3D: a synthetic Scene_XXXXX zip (panorama RGB/depth + camera_xyz)
must extract into per-room .npz dicts that Structured3DDataset loads.
nuScenes: a hand-built info pickle + lidar/lidarseg .bin must round-trip
through NuScenesDataset with the 32->16 learning map (+ camera matrices).
ScanNet: the point-cloud CLI output must load through ScanNetDataset.
"""

import io
import os
import pickle
import zipfile

import numpy as np
import pytest

from ponderv2_tpu.datasets import build_dataset


class TestStructured3D:
    def test_zip_extract_and_dataset_load(self, tmp_path, rng):
        import imageio.v2 as imageio

        from ponderv2_tpu.datasets.preprocessing.preprocess_structured3d import (
            parse_scene_zip,
        )

        H, W = 32, 64
        zpath = tmp_path / "Structured3D_scene_00000.zip"
        with zipfile.ZipFile(zpath, "w") as zf:
            for room in ("485142", "485143"):
                base = f"Structured3D_scene_00000/2D_rendering/{room}/panorama"
                rgb = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
                depth = rng.randint(500, 4000, (H, W)).astype(np.uint16)
                buf = io.BytesIO(); imageio.imwrite(buf, rgb, format="png")
                zf.writestr(f"{base}/full/rgb_rawlight.png", buf.getvalue())
                buf = io.BytesIO(); imageio.imwrite(buf, depth, format="png")
                zf.writestr(f"{base}/full/depth.png", buf.getvalue())
                zf.writestr(f"{base}/camera_xyz.txt", "100 200 1500")
        out_root = tmp_path / "out"
        scene = parse_scene_zip(str(zpath), str(out_root), "train")
        rooms = sorted(os.listdir(out_root / "train" / scene))
        assert len(rooms) == 2

        ds = build_dataset(dict(
            type="Structured3DDataset", split="train",
            data_root=str(out_root),
            transform=[dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                            mode="train", return_grid_coord=True)],
        ))
        assert len(ds) == 2
        sample = ds[0]
        assert sample["coord"].shape[1] == 3
        assert len(sample["coord"]) > 50
        assert (sample["segment"] == -1).all()  # no labels in pano fixture


class TestNuScenes:
    def test_info_pickle_roundtrip(self, tmp_path, rng):
        n = 300
        raw_dir = tmp_path / "raw" / "samples" / "LIDAR_TOP"
        raw_dir.mkdir(parents=True)
        pts = rng.randn(n, 5).astype(np.float32)
        pts[:, 3] = rng.randint(0, 255, n)
        pts.tofile(raw_dir / "tok1.bin")
        seg_dir = tmp_path / "raw" / "lidarseg"
        seg_dir.mkdir(parents=True)
        raw_labels = rng.randint(0, 32, n).astype(np.uint8)
        raw_labels.tofile(seg_dir / "tok1_lidarseg.bin")
        info = [dict(
            token="tok1",
            lidar_path="samples/LIDAR_TOP/tok1.bin",
            gt_segment_path="lidarseg/tok1_lidarseg.bin",
            timestamp=0,
        )]
        info_dir = tmp_path / "info"
        info_dir.mkdir()
        with open(info_dir / "nuscenes_infos_10sweeps_train.pkl", "wb") as f:
            pickle.dump(info, f)

        ds = build_dataset(dict(
            type="NuScenesDataset", split="train", data_root=str(tmp_path),
            sweeps=10, transform=[],
        ))
        assert len(ds) == 1
        sample = ds[0]
        assert sample["coord"].shape == (n, 3)
        assert sample["strength"].max() <= 1.0
        # 32 raw -> 16 learning classes, ignore -1 (reference nuscenes.py map)
        assert sample["segment"].min() >= -1
        assert sample["segment"].max() <= 15
        from ponderv2_tpu.datasets.nuscenes import LEARNING_MAP

        expect = np.array(
            [LEARNING_MAP[int(r)] - 1 if LEARNING_MAP[int(r)] > 0 else -1
             for r in raw_labels]
        )
        np.testing.assert_array_equal(sample["segment"], expect)


class TestScanNetCLI:
    def test_pointcloud_output_loads(self, tmp_path, rng):
        # the CLI writes <out>/<split>/<scene>.pth-style dicts; emulate its
        # output contract and ensure ScanNetDataset consumes it
        import torch

        out = tmp_path / "train"
        out.mkdir(parents=True)
        n = 400
        torch.save(
            dict(coord=rng.rand(n, 3).astype(np.float32),
                 color=rng.rand(n, 3).astype(np.float32) * 255,
                 normal=rng.randn(n, 3).astype(np.float32),
                 semantic_gt20=rng.randint(-1, 20, n).astype(np.int64),
                 instance_gt=rng.randint(-1, 5, n).astype(np.int64)),
            out / "scene0000_00.pth",
        )
        ds = build_dataset(dict(
            type="ScanNetDataset", split="train", data_root=str(tmp_path),
            transform=[],
        ))
        sample = ds[0]
        assert sample["segment"].shape == (n,)
        assert sample["instance"].shape == (n,)
