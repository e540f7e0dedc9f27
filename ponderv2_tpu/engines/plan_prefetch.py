"""Host-side SpUNet plan prefetch for the Trainer's input pipeline.

The SpUNet conv plans (stem k5, per-level k3 + band, strided, inverse) are
pure integer functions of the collated voxel coords — no parameters — and
cost ~70 ms/step when built inside the jitted train step on a v5e at bench
shapes (tools/experiments/probe_plan_cost.py). ``PlanPrefetchLoader`` wraps a
train dataloader and builds the NEXT batch's plans on a background thread
(jax CPU backend) while the device executes the current step, then attaches
them as ``batch["spunet_plans"]`` for the model to consume
(models/ponder/ponder_indoor.py passes them to the backbone).

This is the TPU-native analog of spconv's indice-key rulebook cache that the
reference builds inside its CUDA forward (used via
/root/reference/ponder/models/sparse_unet/spconv_unet_v1m1_base.py:47-65):
integer plan work belongs on the host, dense MXU math on the device.

A thread (not a dataloader worker process) is used deliberately: torch
workers fork, and forking a process whose JAX runtime already initialized a
TPU backend is unsafe; threads share the runtime and the GIL is released
during the XLA:CPU plan executable, so the build genuinely overlaps.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Optional

import numpy as np


def plan_cfg_from_model_cfg(model_cfg: Dict[str, Any],
                            static_ctx: Dict[str, Any]) -> Optional[dict]:
    """Derive the host plan-build config, or None when prefetch doesn't apply.

    Applies to PonderIndoor/Outdoor-v2 models with ``assume_sorted`` (the
    host and device must agree on row order) whose backbone is a plain
    SpUNet (v1m1/v1m2) — PDNorm and Mink variants build their own plans.
    """
    if not isinstance(model_cfg, dict):
        return None
    if not model_cfg.get("assume_sorted", False):
        return None
    bk = model_cfg.get("backbone")
    if not isinstance(bk, dict) or bk.get("type") not in (
        "SpUNet-v1m1", "SpUNet-v1m2",
    ):
        return None
    channels = tuple(bk.get("channels", (32, 64, 128, 256, 256, 128, 96, 96)))
    return dict(
        spatial_shape=tuple(static_ctx["spatial_shape"]),
        batch_size=int(static_ctx["batch_size"]),
        capacities=(tuple(bk["capacities"])
                    if bk.get("capacities") is not None else None),
        channels=channels,
        slab_conv=bool(bk.get("slab_conv", True)),
    )


def attach_plans(batch: Dict[str, Any], plan_cfg: dict) -> Dict[str, Any]:
    """Build plans for one collated batch and attach as ``spunet_plans``."""
    from ..models.sparse_unet.plans import (
        host_build_spunet_plans, plan_capacities,
    )

    grid = np.asarray(batch["grid_coord"])
    caps = plan_cfg["capacities"]
    if caps is None:
        num_stages = len(plan_cfg["channels"]) // 2
        caps = plan_capacities(grid.shape[0], num_stages)
    plans = host_build_spunet_plans(
        grid, np.asarray(batch["batch"]), plan_cfg["spatial_shape"],
        plan_cfg["batch_size"], caps, plan_cfg["channels"],
        slab_conv=plan_cfg["slab_conv"],
    )
    out = dict(batch)
    out["spunet_plans"] = plans
    return out


class PlanPrefetchLoader:
    """Iterate a loader, attaching host-built plans one batch ahead."""

    def __init__(self, loader, plan_cfg: dict, depth: int = 2):
        self.loader = loader
        self.plan_cfg = plan_cfg
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()

        def worker():
            try:
                for batch in self.loader:
                    q.put(attach_plans(batch, self.plan_cfg))
            except BaseException as e:  # surface loader errors to the consumer
                q.put(e)
                return
            q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True,
                             name="spunet-plan-prefetch")
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
