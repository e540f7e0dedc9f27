# Multi-dataset PPT pretraining: ScanNet + S3DIS + Structured3D joint rendering
# pretext (reference configs/scannet/pretrain-ponder-ppt-v1m1-0-sc-s3-st-spunet.py)
from ponderv2_tpu.datasets.ppt_vocab import PPT_CLASS_NAMES, PPT_VALID_INDEX

_base_ = ["./pretrain-ponder-spunet-v1m1-0-base.py"]

batch_size = 8
num_worker = 24
epoch = 2000
eval_epoch = 100

train = dict(type="MultiDatasetTrainer")


model = dict(
    conditions=("Structured3D", "ScanNet", "S3DIS"),
    class_name=PPT_CLASS_NAMES,
    valid_index=PPT_VALID_INDEX,
    ppt_loss_weight=1.0,
)

_pretrain_transform = lambda condition, grid: [
    dict(type="CenterShift", apply_z=True, keys=["extrinsic"]),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0],
         p=0.5, keys=["extrinsic"]),
    dict(type="RandomScale", scale=[0.9, 1.1], keys=["extrinsic"]),
    dict(type="RandomFlip", p=0.5, keys=["extrinsic"]),
    dict(type="GridSample", grid_size=grid, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="SphereCrop", point_max=100000, mode="random"),
    dict(type="NormalizeColor"),
    dict(type="Add", keys_dict=dict(condition=condition)),
    dict(type="Collect",
         keys=("coord", "grid_coord", "segment", "condition", "rgb", "depth",
               "semantic2d", "intrinsic", "extrinsic"),
         feat_keys=("color", "normal")),
]

data = dict(
    train=dict(
        _delete_=True,
        type="ConcatDataset",
        datasets=[
            # loop doubles as the multi-dataset sampling ratio
            dict(type="Structured3DRGBDDataset", split="train",
                 data_root="data/structured3d", num_cameras=5,
                 transform=_pretrain_transform("Structured3D", 0.02), loop=2),
            dict(type="ScanNetRGBDDataset", split="train",
                 data_root="data/scannet", rgbd_root="data/scannet_rgbd",
                 num_cameras=5,
                 transform=_pretrain_transform("ScanNet", 0.02), loop=1),
            dict(type="S3DISRGBDDataset",
                 split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6"),
                 data_root="data/s3dis", num_cameras=5,
                 transform=_pretrain_transform("S3DIS", 0.02), loop=1),
        ],
    ),
)
