# ScanNet200 semseg fine-tune (reference configs/scannet200/semseg-*-ft.py).
# Inherits the ScanNet PPT fine-tune; swaps the dataset and the head vocabulary
# to the 200-class ScanNet200 label set (PPT valid_index passthrough).
_base_ = ["../scannet/semseg-ppt-v1m1-0-sc-s3-st-spunet-lovasz-ft.py"]

num_classes = 200
names = [f"scannet200_class_{i}" for i in range(200)]  # full list via dataset docs

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=num_classes,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)

_train_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomDropout", dropout_ratio=0.2, dropout_application_ratio=0.2),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="ElasticDistortion", distortion_params=[[0.2, 0.4], [0.8, 1.6]]),
    dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
    dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
    dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="SphereCrop", point_max=100000, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="ShufflePoint"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment"),
         feat_keys=("color", "normal")),
]

data = dict(
    num_classes=num_classes,
    names=names,
    train=dict(_delete_=True, type="ScanNet200Dataset", split="train",
               data_root="data/scannet", transform=_train_transform,
               test_mode=False),
    val=dict(_delete_=True, type="ScanNet200Dataset", split="val",
             data_root="data/scannet",
             transform=[
                 dict(type="CenterShift", apply_z=True),
                 dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                      mode="train", return_grid_coord=True),
                 dict(type="CenterShift", apply_z=False),
                 dict(type="NormalizeColor"),
                 dict(type="Collect", keys=("coord", "grid_coord", "segment"),
                      feat_keys=("color", "normal")),
             ],
             test_mode=False),
)
