# Structured3D indoor pretraining: PonderV2 neural-rendering pretext
# (reference configs/structured3d/pretrain-ponder-spunet-v1m1-0-base.py)
_base_ = ["../_base_/default_runtime.py"]

num_classes = 25
names = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "picture", "desk", "shelves", "curtain", "dresser", "pillow",
    "mirror", "ceiling", "refrigerator", "television", "nightstand", "sink",
    "lamp", "otherstructure", "otherfurniture", "otherprop",
]

batch_size = 8  # global; reference: 8/GPU x 8 GPU
batch_size_val = 1
num_worker = 16
mix_prob = 0.0
empty_cache = False
evaluate = False
epoch = 800
eval_epoch = 100
point_budget = 1_048_576
sparse_shape = (1024, 1024, 512)
metric_keys = ("rgb_loss", "depth_loss", "semantic_loss", "psnr", "eikonal_loss",
               "free_space_loss", "sdf_loss", "sparse_sdf_loss")

model = dict(
    type="PonderIndoor-v2",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
    projection=dict(type="UNet3D-v1m2", in_channels=96, out_channels=128,
                    f_maps=32, num_levels=3),
    renderer=dict(
        type="NeuSModel",
        field=dict(
            feature_dim=128,
            hidden_dim=128,
            num_layers=2,
            geo_feat_dim=64,
            semantic_dim=512,
            share_volume=False,
            points_factor=0.0,
            variance_init=0.3,
        ),
        collider=dict(type="AABBBoxCollider", near_plane=0.01),
        sampler=dict(
            type="NeuSSampler",
            num_samples=96,
            num_samples_importance=36,
            num_upsample_steps=1,
            train_stratified=True,
        ),
        loss=dict(
            sensor_depth_truncation=0.05,
            temperature=0.01,
            weights=dict(eikonal=0.01, free_space=1.0, sdf=10.0, depth=1.0,
                         rgb=10.0, semantic=0.1),
        ),
    ),
    mask=None,
    grid_shape=(128, 128, 32),
    grid_size=0.02,
    val_ray_split=10240,
    ray_nsample=256,
    padding=0.1,
    pool_type="mean",
    render_semantic=True,
    conditions=("Structured3D",),
    class_name=tuple(names),
    valid_index=(tuple(range(num_classes)),),
    ppt_loss_weight=0.0,
)

optimizer = dict(type="SGD", lr=0.0001 * batch_size / 8, momentum=0.9,
                 weight_decay=1e-4, nesterov=True)
scheduler = dict(type="OneCycleLR", max_lr=0.0001 * batch_size / 8,
                 pct_start=0.05, anneal_strategy="cos", div_factor=10.0,
                 final_div_factor=10000.0)

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    names=names,
    train=dict(
        type="Structured3DRGBDDataset",
        split="train",
        data_root="data/structured3d",
        num_cameras=5,
        render_semantic=True,
        transform=[
            dict(type="CenterShift", apply_z=True, keys=["extrinsic"]),
            dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0],
                 p=0.5, keys=["extrinsic"]),
            dict(type="RandomScale", scale=[0.9, 1.1], keys=["extrinsic"]),
            dict(type="RandomFlip", p=0.5, keys=["extrinsic"]),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
                 return_grid_coord=True),
            dict(type="SphereCrop", point_max=100000, mode="random"),
            dict(type="NormalizeColor"),
            dict(type="Add", keys_dict={"condition": "Structured3D"}),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "rgb", "depth",
                       "semantic2d", "intrinsic", "extrinsic"),
                 feat_keys=("color", "normal")),
        ],
        loop=1,
    ),
)
