"""ScanNet / ScanNet200 datasets (+ RGB-D pretraining variant).

Reference: /root/reference/ponder/datasets/scannet.py:31-599. Scenes are
preprocessed ``.pth`` dicts (coord/color/normal + ``semantic_gt20`` /
``semantic_gt200`` / ``instance_gt``); the RGB-D variant additionally loads
``num_cameras`` random frames (color/depth/pose/intrinsic) from ``rgbd_root``
with 2D labels remapped to the 20-class nyu40 subset.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils.cache import shared_dict
from ..utils.logger import get_root_logger
from .builder import DATASETS
from .defaults import DefaultDataset, load_scene

VALID_CLASS_IDS_20 = (
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39,
)

CLASS_NAMES_20 = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
)


@DATASETS.register_module()
class ScanNetDataset(DefaultDataset):
    class2id = np.array(VALID_CLASS_IDS_20)

    def __init__(
        self,
        lr_file: Optional[str] = None,
        la_file: Optional[str] = None,
        **kwargs,
    ):
        self.lr = np.loadtxt(lr_file, dtype=str) if lr_file is not None else None
        self.la = (
            __import__("torch").load(la_file) if la_file is not None else None
        )
        super().__init__(**kwargs)

    def get_data_list(self) -> List[str]:
        if self.lr is not None:
            return [
                os.path.join(self.data_root, "train", name + ".pth")
                for name in self.lr
            ]
        return super().get_data_list()

    def get_data(self, idx: int) -> Dict[str, Any]:
        data = super().get_data(idx)
        out = dict(
            coord=np.asarray(data["coord"], np.float32),
            color=np.asarray(data.get("color", np.zeros_like(data["coord"])),
                             np.float32),
            normal=np.asarray(data.get("normal", np.zeros_like(data["coord"])),
                              np.float32),
        )
        if "semantic_gt20" in data:
            out["segment"] = np.asarray(data["semantic_gt20"]).reshape(-1).astype(np.int64)
        else:
            out["segment"] = np.full(out["coord"].shape[0], -1, np.int64)
        if "instance_gt" in data:
            out["instance"] = np.asarray(data["instance_gt"]).reshape(-1).astype(np.int64)
        else:
            out["instance"] = np.full(out["coord"].shape[0], -1, np.int64)
        if self.la is not None:
            # data-efficient limited-annotation: mask all but the listed points
            name = self.get_data_name(idx)
            sampled = self.la[name]
            mask = np.ones_like(out["segment"], bool)
            mask[sampled] = False
            out["segment"][mask] = -1
        return out


@DATASETS.register_module()
class ScanNet200Dataset(ScanNetDataset):
    def get_data(self, idx: int) -> Dict[str, Any]:
        data = load_scene(self.data_list[idx % len(self.data_list)])
        out = dict(
            coord=np.asarray(data["coord"], np.float32),
            color=np.asarray(data.get("color", np.zeros_like(data["coord"])),
                             np.float32),
            normal=np.asarray(data.get("normal", np.zeros_like(data["coord"])),
                              np.float32),
        )
        key = "semantic_gt200" if "semantic_gt200" in data else "segment"
        out["segment"] = (
            np.asarray(data[key]).reshape(-1).astype(np.int64)
            if key in data
            else np.full(out["coord"].shape[0], -1, np.int64)
        )
        out["instance"] = (
            np.asarray(data["instance_gt"]).reshape(-1).astype(np.int64)
            if "instance_gt" in data
            else np.full(out["coord"].shape[0], -1, np.int64)
        )
        return out


@DATASETS.register_module()
class ScanNetRGBDDataset(ScanNetDataset):
    """Pretraining: scene cloud + ``num_cameras`` random RGB-D frames.

    ``rgbd_root`` layout (produced by the preprocessing CLI): per scene a
    directory of frame files ``{scene}/frame_XXXX.npz`` containing
    color (H,W,3), depth (H,W), pose (4,4 cam2world), intrinsic (3,3),
    optional label (H,W). A ``skip.json`` may list bad frames.
    """

    def __init__(
        self,
        rgbd_root: str = "data/scannet_rgbd",
        num_cameras: int = 5,
        render_semantic: bool = True,
        frame_skip_list: Optional[str] = None,
        **kwargs,
    ):
        self.rgbd_root = rgbd_root
        self.num_cameras = num_cameras
        self.render_semantic = render_semantic
        self.skip = set()
        if frame_skip_list and os.path.isfile(frame_skip_list):
            with open(frame_skip_list) as f:
                self.skip = set(json.load(f))
        super().__init__(**kwargs)

    def get_data(self, idx: int) -> Dict[str, Any]:
        data = super().get_data(idx)
        name = self.get_data_name(idx)
        frame_dir = os.path.join(self.rgbd_root, name)
        frames = sorted(
            f for f in glob.glob(os.path.join(frame_dir, "*.npz"))
            if os.path.basename(f) not in self.skip
        )
        if not frames:
            raise FileNotFoundError(f"no RGB-D frames for scene {name} in {frame_dir}")
        pick = np.random.choice(
            len(frames), self.num_cameras, replace=len(frames) < self.num_cameras
        )
        rgbs, depths, sems, intrs, extrs = [], [], [], [], []
        for i in pick:
            fr = np.load(frames[i])
            rgbs.append(np.asarray(fr["color"], np.float32))
            depths.append(np.asarray(fr["depth"], np.float32))
            intrs.append(np.asarray(fr["intrinsic"], np.float32)[:3, :3])
            pose = np.asarray(fr["pose"], np.float32)  # cam2world
            extrs.append(np.linalg.inv(pose).astype(np.float32))
            if self.render_semantic:
                sems.append(
                    np.asarray(fr["label"], np.int64)
                    if "label" in fr
                    else np.full(depths[-1].shape, -1, np.int64)
                )
        data["rgb"] = np.stack(rgbs)
        data["depth"] = np.stack(depths)
        data["intrinsic"] = np.stack(intrs)
        data["extrinsic"] = np.stack(extrs)
        if self.render_semantic:
            data["semantic2d"] = np.stack(sems)
        return data
