"""Benchmark: pretrain-proxy training throughput in scenes/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current stage: SpUNet semseg train step on synthetic ScanNet-scale scenes (the
flagship PonderIndoor render pipeline lands next; the metric stays
scenes/sec/chip throughout — see BASELINE.md north star).

vs_baseline: the reference recipe trains 8 scenes/GPU-step at roughly
5 steps/sec on 8×A100 for the fine-tune-scale model (no published throughput;
BASELINE.md requires establishing it empirically — we use an estimated
5.0 scenes/sec/A100 as the provisional denominator and will replace it with a
measured number when the full pretrain pipeline is benched).
"""

from __future__ import annotations

import json
import time

import numpy as np

PROVISIONAL_REFERENCE_SCENES_PER_SEC_PER_CHIP = 5.0


def main():
    import jax
    import jax.numpy as jnp

    from ponderv2_tpu.datasets import build_dataset
    from ponderv2_tpu.datasets.utils import collate_fn
    from ponderv2_tpu.engines.common import split_batch
    from ponderv2_tpu.engines.train import TrainState, make_train_step
    from ponderv2_tpu.models import build_model
    from ponderv2_tpu.utils.optimizer import build_optimizer
    from ponderv2_tpu.utils.scheduler import build_scheduler

    # ScanNet-scale: ~100k points/scene at 2cm grid, full-size SpUNet.
    # batch sized for a single 16GB v5e chip (the driver's bench device);
    # scenes/sec/chip is the normalized metric either way.
    batch_size = 4
    points_per_scene = 100_000
    point_budget = 409_600
    spatial_shape = (512, 512, 128)
    num_classes = 20

    transform = [
        dict(type="CenterShift", apply_z=True),
        dict(type="PositiveShift"),
        dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
             return_grid_coord=True),
        dict(type="NormalizeColor"),
        dict(type="Collect", keys=("coord", "grid_coord", "segment"),
             feat_keys=("color", "normal")),
    ]
    ds = build_dataset(
        dict(type="SyntheticDataset", num_scenes=batch_size,
             points_per_scene=points_per_scene, num_classes=num_classes,
             transform=transform)
    )
    scenes = [ds[i] for i in range(batch_size)]
    batch = collate_fn(scenes, point_budget=point_budget, scene_budget=batch_size)
    arrays, _ = split_batch(batch)
    arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
    static_ctx = dict(spatial_shape=spatial_shape, batch_size=batch_size)

    model = build_model(
        dict(
            type="DefaultSegmentor",
            backbone=dict(
                type="SpUNet-v1m1",
                in_channels=6,
                num_classes=num_classes,
                compute_dtype=jnp.bfloat16,
            ),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
        )
    )
    init_fn = jax.jit(
        lambda rng, arr: model.init(rng, {**arr, **static_ctx}, train=False)
    )
    variables = init_fn(jax.random.PRNGKey(0), arrays)
    schedule = build_scheduler(dict(type="OneCycleLR", max_lr=0.05), 1000)
    tx = build_optimizer(dict(type="SGD", lr=0.05, momentum=0.9), variables["params"],
                         schedule)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    train_step = make_train_step(model, tx, schedule, static_ctx)

    # compile + warmup. NOTE: force a device->host VALUE fetch, not just
    # block_until_ready — through remote-TPU tunnels the latter can return
    # before execution completes, inflating throughput ~1000x.
    state, metrics = train_step(state, arrays)
    float(metrics["loss"])

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = train_step(state, arrays)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    scenes_per_sec_per_chip = batch_size * n_iters / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "train_scenes_per_sec_per_chip",
                "value": round(scenes_per_sec_per_chip, 3),
                "unit": "scenes/sec/chip",
                "vs_baseline": round(
                    scenes_per_sec_per_chip
                    / PROVISIONAL_REFERENCE_SCENES_PER_SEC_PER_CHIP,
                    3,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
