"""Launch: multi-host initialization (reference ponder/engines/launch.py:38-241).

The reference spawns one process per GPU and initializes NCCL; on TPU there is one
process per host and XLA handles all device collectives, so launch reduces to
``jax.distributed.initialize`` (env- or SLURM-driven) followed by the main
function — no mp.spawn, no process groups.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

from ..utils.logger import get_root_logger


def _should_init_distributed() -> bool:
    if os.environ.get("PONDER_DISABLE_DISTRIBUTED"):
        return False
    return any(
        k in os.environ
        for k in (
            "COORDINATOR_ADDRESS",
            "JAX_COORDINATOR_ADDRESS",
            "SLURM_JOB_NUM_NODES",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )


def launch(
    main_func: Callable,
    num_gpus_per_machine: int = 0,  # accepted for reference CLI parity; unused
    num_machines: int = 1,
    machine_rank: int = 0,
    dist_url: Optional[str] = None,
    cfg: Tuple = (),
    timeout=None,
) -> None:
    import jax

    if _should_init_distributed():
        coordinator = os.environ.get(
            "JAX_COORDINATOR_ADDRESS", os.environ.get("COORDINATOR_ADDRESS")
        )
        kwargs = {}
        if coordinator:
            kwargs["coordinator_address"] = coordinator
        if "SLURM_NTASKS" in os.environ:
            kwargs["num_processes"] = int(os.environ["SLURM_NTASKS"])
            kwargs["process_id"] = int(os.environ["SLURM_PROCID"])
        jax.distributed.initialize(**kwargs)
        get_root_logger().info(
            f"jax.distributed initialized: process {jax.process_index()}/"
            f"{jax.process_count()}, {len(jax.local_devices())} local devices"
        )
    main_func(*cfg)


# SLURM parity alias: the reference has a separate slurm_launch; here the env
# detection inside launch() covers it.
slurm_launch = launch
