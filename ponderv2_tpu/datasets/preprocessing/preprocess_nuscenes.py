"""Offline nuScenes info-pickle generation (lidar paths, lidarseg, sweeps, cams).

Reference: /root/reference/ponder/datasets/preprocessing/nuscenes/
preprocess_nuscenes_info.py:155-278. Requires the ``nuscenes-devkit`` package and
the raw dataset; emits ``info/nuscenes_infos_{sweeps}sweeps_{split}.pkl``
consumed by datasets.nuscenes.NuScenesDataset.
"""

from __future__ import annotations

import argparse
import os
import pickle


def build_infos(dataset_root: str, output_root: str, sweeps: int = 10,
                with_camera: bool = False):
    try:
        from nuscenes.nuscenes import NuScenes
        from nuscenes.utils import splits
    except ImportError as e:
        raise SystemExit(
            "nuscenes-devkit required: run preprocessing on a machine with it "
            "installed (the training job only reads the emitted pickles)"
        ) from e

    nusc = NuScenes(version="v1.0-trainval", dataroot=dataset_root, verbose=True)
    scene_splits = {"train": splits.train, "val": splits.val}
    os.makedirs(os.path.join(output_root, "info"), exist_ok=True)

    for split, scene_names in scene_splits.items():
        infos = []
        for scene in nusc.scene:
            if scene["name"] not in scene_names:
                continue
            token = scene["first_sample_token"]
            while token:
                sample = nusc.get("sample", token)
                lidar = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
                info = dict(
                    token=sample["token"],
                    lidar_path=lidar["filename"],
                    timestamp=sample["timestamp"],
                )
                lidarseg = nusc.get("lidarseg", lidar["token"]) if (
                    "lidarseg" in nusc.table_names
                ) else None
                if lidarseg is not None:
                    info["gt_segment_path"] = lidarseg["filename"]
                if with_camera:
                    import numpy as np
                    from pyquaternion import Quaternion

                    cams = {}
                    for cam in ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
                                "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT"):
                        cd = nusc.get("sample_data", sample["data"][cam])
                        cs = nusc.get("calibrated_sensor",
                                      cd["calibrated_sensor_token"])
                        lcs = nusc.get("calibrated_sensor",
                                       lidar["calibrated_sensor_token"])
                        K = np.asarray(cs["camera_intrinsic"])
                        cam2ego = np.eye(4)
                        cam2ego[:3, :3] = Quaternion(cs["rotation"]).rotation_matrix
                        cam2ego[:3, 3] = cs["translation"]
                        lidar2ego = np.eye(4)
                        lidar2ego[:3, :3] = Quaternion(
                            lcs["rotation"]
                        ).rotation_matrix
                        lidar2ego[:3, 3] = lcs["translation"]
                        lidar2cam = np.linalg.inv(cam2ego) @ lidar2ego
                        P = np.eye(4)
                        P[:3, :3] = K
                        cams[cam] = dict(
                            data_path=cd["filename"],
                            cam_intrinsic=K,
                            lidar2cam=lidar2cam,
                            lidar2img=P @ lidar2cam,
                        )
                    info["cams"] = cams
                infos.append(info)
                token = sample["next"]
        out = os.path.join(
            output_root, "info", f"nuscenes_infos_{sweeps}sweeps_{split}.pkl"
        )
        with open(out, "wb") as f:
            pickle.dump(infos, f)
        print(f"{split}: {len(infos)} samples -> {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--output_root", required=True)
    p.add_argument("--max_sweeps", type=int, default=10)
    p.add_argument("--with_camera", action="store_true")
    args = p.parse_args()
    build_infos(args.dataset_root, args.output_root, args.max_sweeps,
                args.with_camera)


if __name__ == "__main__":
    main()
