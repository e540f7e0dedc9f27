# ScanNet200 instance segmentation fine-tune: PointGroup on a PPT backbone
# (reference configs/scannet200/insseg-ppt-v1m1-0-pointgroup-spunet-ft.py —
# a delta of the ScanNet variant: 200 classes, segment_ignore (-1, 0, 2))
from ponderv2_tpu.datasets.preprocessing.scannet200_constants import (
    CLASS_LABELS_200,
)

_base_ = ["../scannet/insseg-ppt-v1m1-0-pointgroup-spunet-ft.py"]

num_classes = 200
segment_ignore_index = (-1, 0, 2)
names = list(CLASS_LABELS_200)

hooks = [
    dict(type="CheckpointLoader", keywords="module.", replacement="module."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=segment_ignore_index,
         instance_ignore_index=-1),
    dict(type="CheckpointSaver", save_freq=None),
]

model = dict(
    semantic_num_classes=num_classes,
    segment_ignore_index=segment_ignore_index,
)

data = dict(
    num_classes=num_classes,
    names=names,
    train=dict(
        type="ScanNet200Dataset",
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
    ),
    val=dict(
        type="ScanNet200Dataset",
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
    ),
)
