# tiny synthetic semantic-segmentation config: exercises the full train/eval stack
# on procedural scenes with no disk assets (CI / smoke-test config).
_base_ = ["../_base_/default_runtime.py"]

num_classes = 8
batch_size = 2
batch_size_val = 2
epoch = 2
eval_epoch = 2
point_budget = 8192  # padded points per batch
sparse_shape = (160, 160, 64)

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=num_classes,
        base_channels=8,
        channels=(8, 16, 16, 16, 16, 16, 8, 8),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)

optimizer = dict(type="SGD", lr=0.05, momentum=0.9, weight_decay=1e-4)
scheduler = dict(type="OneCycleLR", max_lr=0.05, pct_start=0.3)

_train_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="PositiveShift"),
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="NormalizeColor"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment"),
         feat_keys=("color", "normal")),
]

_val_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="PositiveShift"),
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="NormalizeColor"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment"),
         feat_keys=("color", "normal")),
]

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    names=[f"class_{i}" for i in range(num_classes)],
    train=dict(
        type="SyntheticDataset",
        num_scenes=4,
        points_per_scene=3000,
        num_classes=num_classes,
        transform=_train_transform,
        loop=1,
    ),
    val=dict(
        type="SyntheticDataset",
        num_scenes=2,
        points_per_scene=3000,
        num_classes=num_classes,
        transform=_val_transform,
    ),
)

_test_post = [
    dict(type="Collect", keys=("coord", "grid_coord", "index"),
         feat_keys=("color", "normal")),
]
data.update(
    test=dict(
        type="SyntheticDataset",
        num_scenes=2,
        points_per_scene=3000,
        num_classes=num_classes,
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="PositiveShift"),
            dict(type="NormalizeColor"),
        ],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                          mode="test", return_grid_coord=True,
                          keys=("coord", "color", "normal")),
            post_transform=_test_post,
            aug_transform=[
                [dict(type="RandomRotateTargetAngle", angle=[0], axis="z",
                      center=[0, 0, 0], p=1)],
                [dict(type="RandomRotateTargetAngle", angle=[1], axis="z",
                      center=[0, 0, 0], p=1)],
            ],
        ),
    ),
)
point_budget_test = 4096
