# ScanNet semseg fine-tune from PonderV2 PPT pretraining (language-guided)
# (reference configs/scannet/semseg-ppt-v1m1-0-sc-s3-st-spunet-lovasz-ft.py)
_base_ = ["../_base_/default_runtime.py"]

num_classes = 20
names = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
]

# joint class vocabulary across Structured3D / ScanNet / S3DIS (reference PPT)
joint_class_names = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "picture", "desk", "shelves", "curtain", "dresser", "pillow",
    "mirror", "ceiling", "refrigerator", "television", "nightstand", "sink",
    "lamp", "otherstructure", "otherfurniture", "otherprop",
    "bookshelf", "counter", "shower curtain", "toilet", "bathtub",
    "beam", "column", "clutter", "board", "bookcase",
]
# per-dataset indices into the joint vocabulary
valid_index = (
    tuple(range(25)),  # Structured3D
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 25, 9, 26, 10, 12, 17, 27, 28, 20, 29, 23),  # ScanNet
    (16, 1, 0, 30, 31, 8, 7, 6, 4, 5, 34, 33, 32),  # S3DIS
)

batch_size = 12
batch_size_val = 1
num_worker = 12
mix_prob = 0.8
epoch = 800
eval_epoch = 100
point_budget = 1_572_864
point_budget_val = 262_144
sparse_shape = (1024, 1024, 512)
weight = "exp/scannet/pretrain-ponder-ppt-v1m1/model/model_last.pth"

model = dict(
    type="PPT-v1m1",
    backbone=dict(
        type="SpUNet-v1m3",
        in_channels=6,
        num_classes=0,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        conditions=("Structured3D", "ScanNet", "S3DIS"),
        norm_decouple=True,
        norm_adaptive=True,
        norm_affine=True,
        context_channels=256,
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
    backbone_out_channels=96,
    context_channels=256,
    conditions=("Structured3D", "ScanNet", "S3DIS"),
    class_name=tuple(joint_class_names),
    valid_index=valid_index,
)

optimizer = dict(type="SGD", lr=0.05, momentum=0.9, weight_decay=1e-4, nesterov=True)
scheduler = dict(type="OneCycleLR", max_lr=0.05, pct_start=0.05,
                 anneal_strategy="cos", div_factor=10.0, final_div_factor=10000.0)

_train_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomDropout", dropout_ratio=0.2, dropout_application_ratio=0.2),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
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
    dict(type="Add", keys_dict=dict(condition="ScanNet")),
    dict(type="Collect", keys=("coord", "grid_coord", "segment", "condition"),
         feat_keys=("color", "normal")),
]

_val_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="Add", keys_dict=dict(condition="ScanNet")),
    dict(type="Collect", keys=("coord", "grid_coord", "segment", "condition"),
         feat_keys=("color", "normal")),
]

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    names=names,
    train=dict(type="ScanNetDataset", split="train", data_root="data/scannet",
               transform=_train_transform, test_mode=False),
    val=dict(type="ScanNetDataset", split="val", data_root="data/scannet",
             transform=_val_transform, test_mode=False),
    test=dict(
        type="ScanNetDataset", split="val", data_root="data/scannet",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="NormalizeColor"),
        ],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                          mode="test", return_grid_coord=True,
                          keys=("coord", "color", "normal")),
            crop=None,
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="Add", keys_dict=dict(condition="ScanNet")),
                dict(type="Collect",
                     keys=("coord", "grid_coord", "index", "condition"),
                     feat_keys=("color", "normal")),
            ],
            aug_transform=[
                [dict(type="RandomRotateTargetAngle", angle=[0], axis="z",
                      center=[0, 0, 0], p=1)],
                [dict(type="RandomRotateTargetAngle", angle=[1 / 2], axis="z",
                      center=[0, 0, 0], p=1)],
                [dict(type="RandomRotateTargetAngle", angle=[1], axis="z",
                      center=[0, 0, 0], p=1)],
                [dict(type="RandomRotateTargetAngle", angle=[3 / 2], axis="z",
                      center=[0, 0, 0], p=1)],
            ],
        ),
    ),
)
