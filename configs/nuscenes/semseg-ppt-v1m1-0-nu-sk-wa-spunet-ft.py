# nuScenes lidarseg fine-tune (reference configs/nuscenes/semseg-*-ft.py)
_base_ = ["../_base_/default_runtime.py"]

num_classes = 16
names = [
    "barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
    "pedestrian", "traffic_cone", "trailer", "truck", "driveable_surface",
    "other_flat", "sidewalk", "terrain", "manmade", "vegetation",
]

batch_size = 12
batch_size_val = 1
num_worker = 16
mix_prob = 0.8
epoch = 50
eval_epoch = 50
point_budget = 524_288
point_budget_val = 65_536
sparse_shape = (1440, 1440, 108)
point_cloud_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
weight = "exp/nuscenes/pretrain-ponder-spunet-v1m1/model/model_last.pth"

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=4,
        num_classes=num_classes,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0,
             ignore_index=-1),
    ],
)

optimizer = dict(type="AdamW", lr=2e-4, weight_decay=0.01)
scheduler = dict(type="OneCycleLR", max_lr=2e-4, pct_start=0.04,
                 anneal_strategy="cos", div_factor=10.0, final_div_factor=100.0)

_transforms = lambda train: (
    ([dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
      dict(type="RandomScale", scale=[0.9, 1.1]),
      dict(type="RandomFlip", p=0.5),
      dict(type="RandomJitter", sigma=0.005, clip=0.02)] if train else [])
    + [
        dict(type="PointRangeFilter", point_cloud_range=point_cloud_range,
             padding=0.1),
        dict(type="GridSample", grid_size=0.075, hash_type="fnv", mode="train",
             return_grid_coord=True, keys=("coord", "strength", "segment")),
        dict(type="Collect", keys=("coord", "grid_coord", "segment"),
             feat_keys=("coord", "strength")),
    ]
)

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    names=names,
    train=dict(type="NuScenesDataset", split="train", data_root="data/nuscenes",
               sweeps=10, transform=_transforms(True), test_mode=False),
    val=dict(type="NuScenesDataset", split="val", data_root="data/nuscenes",
             sweeps=10, transform=_transforms(False), test_mode=False),
    test=dict(
        type="NuScenesDataset", split="val", data_root="data/nuscenes",
        sweeps=10,
        transform=[dict(type="PointRangeFilter",
                        point_cloud_range=point_cloud_range, padding=0.1)],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.075, hash_type="fnv",
                          mode="test", return_grid_coord=True,
                          keys=("coord", "strength")),
            crop=None,
            post_transform=[
                dict(type="Collect", keys=("coord", "grid_coord", "index"),
                     feat_keys=("coord", "strength")),
            ],
            aug_transform=[
                [dict(type="RandomRotateTargetAngle", angle=[0], axis="z",
                      center=[0, 0, 0], p=1)],
            ],
        ),
    ),
)
