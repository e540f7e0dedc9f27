# nuScenes pretraining + color rendering, AMP augs (full geometric aug set)
# (reference configs/nuscenes/pretrain-ponder-spunet-v1m1-0-base-color-amp.py;
# bf16 compute on TPU plays the role of AMP)
_base_ = ["./pretrain-ponder-spunet-v1m1-0-base-color.py"]

point_cloud_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)

data = dict(
    train=dict(
        transform=[
            dict(type="RandomRotate", angle=[-0.25, 0.25], axis="z",
                 center=[0, 0, 0], p=0.5, keys=["lidar2img", "lidar2cam"]),
            dict(type="RandomScale", scale=[0.9, 1.1], anisotropic=False,
                 keys=["lidar2img", "lidar2cam"]),
            dict(type="RandomShift", shift=[0.5, 0.5, 0.5],
                 keys=["lidar2img", "lidar2cam"]),
            dict(type="RandomFlip", p=0.5, keys=["lidar2img", "lidar2cam"]),
            dict(type="PointRangeFilter", point_cloud_range=point_cloud_range,
                 padding=0.1),
            dict(type="ProjectOnImage", depth_threshold=0.05),
            dict(type="RaySample", point_nsample=512, fetch_color=True,
                 fetch_segment=True),
            dict(type="GridSample", grid_size=0.075, hash_type="fnv",
                 mode="train", return_grid_coord=True,
                 keys=("coord", "strength", "segment")),
            dict(type="Add", keys_dict={"condition": "NuScenes"}),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "ray_start", "ray_end",
                       "ray_rgb", "ray_segment", "ray_valid"),
                 feat_keys=("coord", "strength")),
        ],
    ),
)
