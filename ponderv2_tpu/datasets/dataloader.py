"""Data loaders: torch DataLoader under the hood (CPU-side), emitting padded
numpy batches ready for device transfer.

``MultiDatasetDataloader`` mirrors the reference's round-robin multi-dataset
loader (/root/reference/ponder/datasets/dataloader.py:25-117): one sub-loader per
dataset inside a ConcatDataset, yielding ``ratio_i`` consecutive batches from
dataset i (ratio = the dataset's ``loop``), epoch length anchored to the main
(first) dataset.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

from ..utils.env import derive_seed
from .defaults import ConcatDataset
from .utils import point_collate_fn


def _worker_init(worker_id: int, base_seed: int = 0):
    np.random.seed(derive_seed(base_seed, worker_id))


def build_dataloader(
    dataset,
    batch_size: int = 1,
    num_workers: int = 0,
    shuffle: bool = False,
    drop_last: bool = False,
    point_budget: Optional[int] = None,
    mix_prob: float = 0.0,
    scene_budget: Optional[int] = None,
    seed: int = 0,
    persistent_workers: bool = False,
    num_shards: int = 1,
):
    import torch.utils.data as tud

    return tud.DataLoader(
        _TorchDatasetAdapter(dataset),
        batch_size=batch_size,
        shuffle=shuffle,
        drop_last=drop_last,
        num_workers=num_workers,
        collate_fn=partial(
            point_collate_fn, point_budget=point_budget, mix_prob=mix_prob,
            scene_budget=scene_budget, num_shards=num_shards,
        ),
        worker_init_fn=partial(_worker_init, base_seed=seed),
        persistent_workers=persistent_workers and num_workers > 0,
    )


class _TorchDatasetAdapter:
    """Expose our dataset protocol as a torch map-style dataset."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __getitem__(self, idx):
        return self.dataset[idx]

    def __len__(self):
        return len(self.dataset)


class MultiDatasetDataloader:
    """Round-robin over per-dataset loaders with ratio-consecutive batches."""

    def __init__(
        self,
        concat_dataset: ConcatDataset,
        batch_size_per_dataset: int,
        num_workers: int = 0,
        point_budget: Optional[int] = None,
        mix_prob: float = 0.0,
        seed: int = 0,
        num_shards: int = 1,
    ):
        self.datasets = concat_dataset.datasets
        self.ratios = [getattr(ds, "loop", 1) for ds in self.datasets]
        # the per-dataset loop was consumed as a ratio: reset to 1 for len()
        for ds in self.datasets:
            ds.loop = 1
        self.loaders = [
            build_dataloader(
                ds,
                batch_size=batch_size_per_dataset,
                num_workers=num_workers,
                shuffle=True,
                drop_last=True,
                point_budget=point_budget,
                scene_budget=batch_size_per_dataset,
                mix_prob=mix_prob,
                seed=derive_seed(seed, i),
                num_shards=num_shards,
            )
            for i, ds in enumerate(self.datasets)
        ]

    def __iter__(self):
        iters = [iter(ld) for ld in self.loaders]
        main_steps = len(self.loaders[0])
        done_main = 0
        while done_main < main_steps:
            for i, (it, ratio) in enumerate(zip(iters, self.ratios)):
                for _ in range(ratio):
                    try:
                        batch = next(iters[i])
                    except StopIteration:
                        iters[i] = iter(self.loaders[i])
                        batch = next(iters[i])
                    batch["condition"] = getattr(
                        self.datasets[i], "condition", type(self.datasets[i]).__name__
                    )
                    yield batch
                    if i == 0:
                        done_main += 1
                        if done_main >= main_steps:
                            return

    def __len__(self):
        # each round-robin round yields ratio_i batches per dataset and advances
        # the main dataset by ratio_0; the epoch ends when the main dataset's
        # batches are exhausted
        main_steps = len(self.loaders[0])
        rounds = -(-main_steps // max(self.ratios[0], 1))
        return min(rounds * sum(self.ratios),
                   rounds * sum(self.ratios) - (rounds * self.ratios[0] - main_steps))
