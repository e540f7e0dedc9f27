# S3DIS Area-5 semseg fine-tune from PonderV2 PPT pretraining
# (reference configs/s3dis/semseg-ppt-v1m1-0-sc-s3-st-spunet-lovasz-ft.py)
_base_ = ["../scannet/semseg-ppt-v1m1-0-sc-s3-st-spunet-lovasz-ft.py"]

num_classes = 13
names = [
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "table",
    "chair", "sofa", "bookcase", "board", "clutter",
]

_train_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomDropout", dropout_ratio=0.2, dropout_application_ratio=0.2),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
    dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
    dict(type="GridSample", grid_size=0.04, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="SphereCrop", point_max=80000, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="ShufflePoint"),
    dict(type="Add", keys_dict=dict(condition="S3DIS")),
    dict(type="Collect", keys=("coord", "grid_coord", "segment", "condition"),
         feat_keys=("color",)),
]

_val_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="GridSample", grid_size=0.04, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="Add", keys_dict=dict(condition="S3DIS")),
    dict(type="Collect", keys=("coord", "grid_coord", "segment", "condition"),
         feat_keys=("color",)),
]

model = dict(backbone=dict(in_channels=3))

data = dict(
    _delete_=True,
    num_classes=num_classes,
    ignore_index=-1,
    names=names,
    train=dict(
        type="S3DISDataset",
        split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6"),
        data_root="data/s3dis",
        transform=_train_transform,
        test_mode=False,
    ),
    val=dict(
        type="S3DISDataset",
        split="Area_5",
        data_root="data/s3dis",
        transform=_val_transform,
        test_mode=False,
    ),
    test=dict(
        type="S3DISDataset",
        split="Area_5",
        data_root="data/s3dis",
        transform=[dict(type="CenterShift", apply_z=True),
                   dict(type="NormalizeColor")],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.04, hash_type="fnv",
                          mode="test", return_grid_coord=True,
                          keys=("coord", "color")),
            crop=None,
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="Add", keys_dict=dict(condition="S3DIS")),
                dict(type="Collect",
                     keys=("coord", "grid_coord", "index", "condition"),
                     feat_keys=("color",)),
            ],
            aug_transform=[
                [dict(type="RandomRotateTargetAngle", angle=[0], axis="z",
                      center=[0, 0, 0], p=1)],
            ],
        ),
    ),
)
