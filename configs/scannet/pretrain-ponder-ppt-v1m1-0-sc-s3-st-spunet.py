# Multi-dataset PPT pretraining: ScanNet + S3DIS + Structured3D joint rendering
# pretext (reference configs/scannet/pretrain-ponder-ppt-v1m1-0-sc-s3-st-spunet.py)
_base_ = ["./pretrain-ponder-spunet-v1m1-0-base.py"]

batch_size = 8
num_worker = 24
epoch = 2000
eval_epoch = 100

train = dict(type="MultiDatasetTrainer")

joint_class_names = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "picture", "desk", "shelves", "curtain", "dresser", "pillow",
    "mirror", "ceiling", "refrigerator", "television", "nightstand", "sink",
    "lamp", "otherstructure", "otherfurniture", "otherprop",
    "bookshelf", "counter", "shower curtain", "toilet", "bathtub",
    "beam", "column", "clutter", "board", "bookcase",
]
valid_index = (
    tuple(range(25)),  # Structured3D
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 25, 9, 26, 10, 12, 17, 27, 28, 20, 29, 23),  # ScanNet
    (16, 1, 0, 30, 31, 8, 7, 6, 4, 5, 34, 33, 32),  # S3DIS
)

model = dict(
    conditions=("Structured3D", "ScanNet", "S3DIS"),
    class_name=tuple(joint_class_names),
    valid_index=valid_index,
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
