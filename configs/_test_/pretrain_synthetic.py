# tiny synthetic RGB-D pretraining config: PonderIndoor-v2 end to end through the
# Trainer on procedural scenes (CI / smoke-test config, no disk assets).
_base_ = ["../_base_/default_runtime.py"]

num_classes = 8
batch_size = 2
epoch = 1
eval_epoch = 1
evaluate = False
point_budget = 4096
sparse_shape = (160, 160, 64)
metric_keys = ("rgb_loss", "depth_loss", "semantic_loss", "psnr")

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=1),
    dict(type="InformationWriter"),
    dict(type="CheckpointSaver"),
]

model = dict(
    type="PonderIndoor-v2",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        base_channels=8,
        channels=(8, 16, 16, 16, 16, 16, 8, 8),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
    ),
    projection=dict(type="UNet3D-v1m2", in_channels=8, out_channels=16,
                    f_maps=8, num_levels=2),
    renderer=dict(
        type="NeuSModel",
        field=dict(hidden_dim=32, num_layers=2, geo_feat_dim=8,
                   semantic_dim=512, share_volume=False),
        collider=dict(type="AABBBoxCollider", near_plane=0.01),
        sampler=dict(type="NeuSSampler", num_samples=16,
                     num_samples_importance=8, num_upsample_steps=1),
        loss=dict(sensor_depth_truncation=0.05,
                  weights=dict(rgb=10.0, depth=1.0, semantic=0.1,
                               eikonal=0.01, free_space=1.0, sdf=10.0,
                               sparse_sdf=0.1)),
    ),
    grid_shape=(32, 32, 16),
    grid_size=0.02,
    ray_nsample=32,
    padding=0.1,
    conditions=("Synthetic",),
    class_name=tuple(f"class_{i}" for i in range(num_classes)),
    valid_index=(tuple(range(num_classes)),),
    ppt_loss_weight=0.1,
)

optimizer = dict(type="SGD", lr=0.001, momentum=0.9, weight_decay=1e-4)
scheduler = dict(type="OneCycleLR", max_lr=0.001, pct_start=0.3)

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    names=[f"class_{i}" for i in range(num_classes)],
    train=dict(
        type="SyntheticRGBDDataset",
        num_scenes=4,
        points_per_scene=1500,
        num_classes=num_classes,
        num_cameras=2,
        image_size=32,
        transform=[
            dict(type="CenterShift", apply_z=True, keys=["extrinsic"]),
            dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                 mode="train", return_grid_coord=True),
            dict(type="NormalizeColor"),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "rgb", "depth",
                       "semantic2d", "intrinsic", "extrinsic"),
                 feat_keys=("color", "normal")),
        ],
    ),
)
