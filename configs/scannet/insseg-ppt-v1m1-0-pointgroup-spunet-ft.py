# ScanNet instance segmentation fine-tune: PointGroup on a PPT (multi-dataset
# prompt-tuned) SpUNet-v1m3 backbone in backbone_mode
# (reference configs/scannet/insseg-ppt-v1m1-0-pointgroup-spunet-ft.py)
from ponderv2_tpu.datasets.ppt_vocab import (
    PPT_CLASS_NAMES_INSSEG,
    PPT_VALID_INDEX,
)

_base_ = ["../_base_/default_runtime.py"]

num_classes = 20
segment_ignore_index = (-1, 0, 1)
names = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refridgerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
]

batch_size = 12
batch_size_val = 1
num_worker = 24
mix_prob = 0.0
epoch = 800
eval_epoch = 100
point_budget = 1_572_864
point_budget_val = 262_144
sparse_shape = (1024, 1024, 512)
weight = "exp/scannet/pretrain-ponder-ppt-v1m1/model/model_last.pth"

hooks = [
    dict(type="CheckpointLoader", keywords="module.", replacement="module."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=segment_ignore_index,
         instance_ignore_index=-1),
    dict(type="CheckpointSaver", save_freq=None),
]

model = dict(
    type="PG-v1m1",
    backbone=dict(
        type="PPT-v1m1",
        backbone=dict(
            type="SpUNet-v1m3",
            in_channels=6,
            num_classes=0,
            base_channels=32,
            context_channels=256,
            channels=(32, 64, 128, 256, 256, 128, 96, 96),
            layers=(2, 3, 4, 6, 2, 2, 2, 2),
            cls_mode=False,
            conditions=("ScanNet", "S3DIS", "Structured3D"),
            zero_init=False,
            norm_decouple=True,
            norm_adaptive=True,
            norm_affine=True,
        ),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
        backbone_out_channels=96,
        context_channels=256,
        conditions=("Structured3D", "ScanNet", "S3DIS"),
        template="[x]",
        class_name=PPT_CLASS_NAMES_INSSEG,
        valid_index=PPT_VALID_INDEX,
        backbone_mode=True,
    ),
    backbone_out_channels=96,
    semantic_num_classes=num_classes,
    semantic_ignore_index=-1,
    segment_ignore_index=segment_ignore_index,
    instance_ignore_index=-1,
    cluster_thresh=1.5,
    cluster_closed_points=300,
    cluster_propose_points=100,
    cluster_min_points=50,
    voxel_size=0.02,
)

optimizer = dict(type="SGD", lr=0.1, momentum=0.9, weight_decay=1e-4, nesterov=True)
scheduler = dict(type="PolyLR", base_lr=0.1, power=0.9)

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    names=names,
    train=dict(
        type="ScanNetDataset",
        split="train",
        data_root="data/scannet",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomDropout", dropout_ratio=0.2,
                 dropout_application_ratio=0.5),
            dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0],
                 p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="ElasticDistortion",
                 distortion_params=[[0.2, 0.4], [0.8, 1.6]]),
            dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
            dict(type="ChromaticTranslation", p=0.95, ratio=0.1),
            dict(type="ChromaticJitter", p=0.95, std=0.05),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
                 return_grid_coord=True,
                 keys=("coord", "color", "normal", "segment", "instance")),
            dict(type="SphereCrop", sample_rate=0.8, mode="random"),
            dict(type="NormalizeColor"),
            dict(type="InstanceParser", segment_ignore_index=segment_ignore_index,
                 instance_ignore_index=-1),
            dict(type="Add", keys_dict={"condition": "ScanNet"}),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "instance",
                       "instance_centroid", "condition"),
                 feat_keys=("color", "normal")),
        ],
        test_mode=False,
    ),
    val=dict(
        type="ScanNetDataset",
        split="val",
        data_root="data/scannet",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
                 return_grid_coord=True,
                 keys=("coord", "color", "normal", "segment", "instance")),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="InstanceParser", segment_ignore_index=segment_ignore_index,
                 instance_ignore_index=-1),
            dict(type="Add", keys_dict={"condition": "ScanNet"}),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "instance",
                       "instance_centroid", "condition"),
                 feat_keys=("color", "normal")),
        ],
        test_mode=False,
    ),
)
