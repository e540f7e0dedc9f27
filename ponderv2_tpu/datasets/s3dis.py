"""S3DIS datasets (reference /root/reference/ponder/datasets/s3dis.py:24-295)."""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, List, Optional

import numpy as np

from .builder import DATASETS
from .defaults import DefaultDataset, load_scene

S3DIS_CLASS_NAMES = (
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "table",
    "chair", "sofa", "bookcase", "board", "clutter",
)


@DATASETS.register_module()
class S3DISDataset(DefaultDataset):
    """Area-split rooms stored as .pth dicts (coord/color/normal/segment/instance)."""

    def get_data(self, idx: int) -> Dict[str, Any]:
        data = super().get_data(idx)
        out = dict(
            coord=np.asarray(data["coord"], np.float32),
            color=np.asarray(
                data.get("color", np.zeros_like(data["coord"])), np.float32
            ),
        )
        if "normal" in data:
            out["normal"] = np.asarray(data["normal"], np.float32)
        for src, dst in (("semantic_gt", "segment"), ("segment", "segment"),
                         ("instance_gt", "instance"), ("instance", "instance")):
            if src in data and dst not in out:
                out[dst] = np.asarray(data[src]).reshape(-1).astype(np.int64)
        out.setdefault("segment", np.full(out["coord"].shape[0], -1, np.int64))
        out.setdefault("instance", np.full(out["coord"].shape[0], -1, np.int64))
        return out


@DATASETS.register_module()
class S3DISRGBDDataset(S3DISDataset):
    """Rooms that have per-view RGB-D dicts under ``{room}_rgbd/*.pth``
    (reference filter at s3dis.py:185-208)."""

    def __init__(self, num_cameras: int = 5, render_semantic: bool = True,
                 **kwargs):
        self.num_cameras = num_cameras
        self.render_semantic = render_semantic
        super().__init__(**kwargs)

    def get_data_list(self) -> List[str]:
        data_list = super().get_data_list()
        return [
            p for p in data_list
            if glob.glob(os.path.join(os.path.splitext(p)[0] + "_rgbd", "*"))
        ]

    def get_data(self, idx: int) -> Dict[str, Any]:
        data = super().get_data(idx)
        path = self.data_list[idx % len(self.data_list)]
        views = sorted(glob.glob(os.path.join(os.path.splitext(path)[0] + "_rgbd", "*")))
        pick = np.random.choice(
            len(views), self.num_cameras, replace=len(views) < self.num_cameras
        )
        rgbs, depths, sems, intrs, extrs = [], [], [], [], []
        for i in pick:
            view = load_scene(views[i])
            rgbs.append(np.asarray(view["color"], np.float32))
            depths.append(np.asarray(view["depth"], np.float32))
            intrs.append(np.asarray(view["intrinsic"], np.float32)[:3, :3])
            extr = np.asarray(view.get("extrinsic", view.get("pose")), np.float32)
            if "pose" in view and "extrinsic" not in view:
                extr = np.linalg.inv(extr)
            extrs.append(extr.astype(np.float32))
            if self.render_semantic:
                sems.append(
                    np.asarray(view["label"], np.int64) if "label" in view
                    else np.full(depths[-1].shape, -1, np.int64)
                )
        data["rgb"] = np.stack(rgbs)
        data["depth"] = np.stack(depths)
        data["intrinsic"] = np.stack(intrs)
        data["extrinsic"] = np.stack(extrs)
        if self.render_semantic:
            data["semantic2d"] = np.stack(sems)
        return data
