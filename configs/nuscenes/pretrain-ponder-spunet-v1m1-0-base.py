# nuScenes outdoor LiDAR pretraining: PonderV2 rendering pretext
# (reference configs/nuscenes/pretrain-ponder-spunet-v1m1-0-base.py:3-105)
_base_ = ["../_base_/default_runtime.py"]

num_classes = 16
names = [
    "barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
    "pedestrian", "traffic_cone", "trailer", "truck", "driveable_surface",
    "other_flat", "sidewalk", "terrain", "manmade", "vegetation",
]

batch_size = 4  # global; reference: 4/GPU x 4 GPU
num_worker = 16
evaluate = False
epoch = 24
eval_epoch = 24
point_budget = 262_144
sparse_shape = (1440, 1440, 108)
point_cloud_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
# base = depth-only rendering (reference base config has no rgb decoder; the
# -color / -color-amp / -semantic variants add color / semantic heads)
metric_keys = ("depth_loss", "eikonal_loss", "free_space_loss", "sdf_loss")

model = dict(
    type="PonderOutdoor-v2",
    # MAE-style voxel-block masking of the lidar features (reference :22)
    mask=dict(ratio=0.8, size=8, channel=4),
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=4,  # xyz-strength lidar features
        num_classes=0,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
    projection=dict(type="SimpleConv3D-v1m1", in_channels=96, out_channels=32),
    renderer=dict(
        type="NeuSModel",
        field=dict(
            feature_dim=32,
            hidden_dim=128,
            num_layers=2,
            geo_feat_dim=15,
            use_color=False,
            use_semantic=False,
            share_volume=True,
            points_factor=0.0,
        ),
        collider=dict(type="AABBBoxCollider", near_plane=0.01),
        sampler=dict(type="NeuSSampler", num_samples=72,
                     num_samples_importance=24, num_upsample_steps=1),
        loss=dict(
            sensor_depth_truncation=0.01,
            weights=dict(eikonal=0.01, free_space=1.0, sdf=10.0, depth=1.0),
        ),
    ),
    # per-condition tuples (reference :72-74)
    grid_shape=((180, 180, 5),),
    point_cloud_range=(point_cloud_range,),
    grid_size=((0.6, 0.6, 1.6),),
    pool_type="mean",
    render_semantic=False,
    conditions=("NuScenes",),
)

optimizer = dict(type="AdamW", lr=2e-4, weight_decay=0.01)
scheduler = dict(type="OneCycleLR", max_lr=2e-4, pct_start=0.3)

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    names=names,
    train=dict(
        type="NuScenesDataset",
        split="train",
        data_root="data/nuscenes",
        sweeps=10,
        use_camera=True,
        transform=[
            dict(type="PointRangeFilter", point_cloud_range=point_cloud_range,
                 padding=0.1),
            dict(type="ProjectOnImage", depth_threshold=0.05),
            dict(type="RaySample", point_nsample=512, fetch_color=False,
                 fetch_segment=False),
            dict(type="GridSample", grid_size=0.075, hash_type="fnv",
                 mode="train", return_grid_coord=True,
                 keys=("coord", "strength", "segment")),
            dict(type="Add", keys_dict={"condition": "NuScenes"}),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "ray_start", "ray_end",
                       "ray_valid"),
                 feat_keys=("coord", "strength")),
        ],
    ),
)
