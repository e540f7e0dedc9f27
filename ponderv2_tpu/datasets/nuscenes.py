"""nuScenes LiDAR dataset (reference /root/reference/ponder/datasets/nuscenes.py:39-175).

Scenes come from pickled "info" files produced by the preprocessing CLI: each
record carries the lidar path, lidarseg label path, sweep list, and (with
``use_camera``) six camera image paths with lidar2img/lidar2cam matrices.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils.logger import get_root_logger
from .builder import DATASETS
from .defaults import DefaultDataset

# 32 raw classes -> 16 learning classes (reference nuscenes.py:139-175)
LEARNING_MAP = {
    1: 0, 5: 0, 7: 0, 8: 0, 10: 0, 11: 0, 13: 0, 19: 0, 20: 0, 0: 0, 29: 0,
    31: 0, 9: 1, 14: 2, 15: 3, 16: 3, 17: 4, 18: 5, 21: 6, 2: 7, 3: 7, 4: 7,
    6: 7, 12: 8, 22: 9, 23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 30: 16,
}

CLASS_NAMES_16 = (
    "barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
    "pedestrian", "traffic_cone", "trailer", "truck", "driveable_surface",
    "other_flat", "sidewalk", "terrain", "manmade", "vegetation",
)


@DATASETS.register_module()
class NuScenesDataset(DefaultDataset):
    def __init__(
        self,
        sweeps: int = 10,
        use_camera: bool = False,
        num_cameras: int = 6,
        **kwargs,
    ):
        self.sweeps = sweeps
        self.use_camera = use_camera
        self.num_cameras = num_cameras
        self.learning_map = np.full(
            max(LEARNING_MAP.keys()) + 1, -1, dtype=np.int64
        )
        for k, v in LEARNING_MAP.items():
            # 0 is "ignore" in the reference map (mapped to ignore_index later);
            # shift so classes are 0..15 and ignore is -1
            self.learning_map[k] = v - 1 if v > 0 else -1
        super().__init__(**kwargs)

    def get_data_list(self) -> List[Dict]:
        info_path = os.path.join(
            self.data_root, "info", f"nuscenes_infos_{self.sweeps}sweeps_{self.split}.pkl"
        )
        if not os.path.isfile(info_path):
            get_root_logger().warning(f"nuScenes info file missing: {info_path}")
            return []
        with open(info_path, "rb") as f:
            return pickle.load(f)

    def get_data(self, idx: int) -> Dict[str, Any]:
        info = self.data_list[idx % len(self.data_list)]
        lidar_path = os.path.join(self.data_root, "raw", info["lidar_path"])
        points = np.fromfile(lidar_path, dtype=np.float32).reshape(-1, 5)
        coord = points[:, :3]
        strength = points[:, 3:4] / 255.0

        out: Dict[str, Any] = dict(coord=coord, strength=strength.astype(np.float32))
        if "gt_segment_path" in info:
            seg_path = os.path.join(self.data_root, "raw", info["gt_segment_path"])
            raw = np.fromfile(seg_path, dtype=np.uint8).reshape(-1)
            out["segment"] = self.learning_map[raw]
        else:
            out["segment"] = np.full(coord.shape[0], -1, np.int64)

        if self.use_camera and "cams" in info:
            import imageio.v2 as imageio

            rgbs, l2i, l2c, intrs = [], [], [], []
            for cam, cam_info in list(info["cams"].items())[: self.num_cameras]:
                img = imageio.imread(
                    os.path.join(self.data_root, "raw", cam_info["data_path"])
                )
                rgbs.append(np.asarray(img, np.float32))
                l2i.append(np.asarray(cam_info["lidar2img"], np.float32))
                l2c.append(np.asarray(cam_info["lidar2cam"], np.float32))
                intrs.append(np.asarray(cam_info["cam_intrinsic"], np.float32))
            out["rgb"] = np.stack(rgbs)
            out["lidar2img"] = np.stack(l2i)
            out["lidar2cam"] = np.stack(l2c)
            out["intrinsic"] = np.stack(intrs)
        return out

    def get_data_name(self, idx: int) -> str:
        info = self.data_list[idx % len(self.data_list)]
        return str(info.get("token", idx))
