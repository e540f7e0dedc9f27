# nuScenes pretraining + CLIP-semantic rendering
# (reference configs/nuscenes/pretrain-ponder-spunet-v1m1-0-base-semantic.py)
_base_ = ["./pretrain-ponder-spunet-v1m1-0-base.py"]

num_classes = 16
names = [
    "barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
    "pedestrian", "traffic_cone", "trailer", "truck", "driveable_surface",
    "other_flat", "sidewalk", "terrain", "manmade", "vegetation",
]
point_cloud_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
metric_keys = ("depth_loss", "semantic_loss", "eikonal_loss",
               "free_space_loss", "sdf_loss")

model = dict(
    renderer=dict(
        field=dict(use_semantic=True, semantic_dim=512),
        loss=dict(
            temperature=0.01,
            # outdoor semantic gt indexes label 0 too (reference
            # ponder_outdoor_base.py:169-174)
            semantic_min_label=0,
            weights=dict(semantic=0.1),
        ),
    ),
    render_semantic=True,
    conditions=("NuScenes",),
    class_name=tuple(names),
    valid_index=(tuple(range(num_classes)),),
)

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
            dict(type="RaySample", point_nsample=512, fetch_color=False,
                 fetch_segment=True),
            dict(type="GridSample", grid_size=0.075, hash_type="fnv",
                 mode="train", return_grid_coord=True,
                 keys=("coord", "strength", "segment")),
            dict(type="Add", keys_dict={"condition": "NuScenes"}),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "ray_start", "ray_end",
                       "ray_segment", "ray_valid"),
                 feat_keys=("coord", "strength")),
        ],
    ),
)
