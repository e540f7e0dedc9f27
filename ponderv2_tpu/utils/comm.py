"""Multi-host communication helpers — the TPU-native analog of the reference's
NCCL/gloo helpers (``ponder/utils/comm.py:24-199``).

On TPU there is one python process per host; collectives on device data happen inside
jitted code via XLA (psum/all_gather over the mesh). What remains host-side is:
process identity, barriers, and gathering small picklable objects (metrics, eval
records) — done here via ``jax.experimental.multihost_utils``.
"""

from __future__ import annotations

import pickle
from typing import Any, List, Optional

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def get_local_rank() -> int:
    # one process per host on TPU; local rank == 0 always
    return 0


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across hosts (no-op single-process)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ponderv2_tpu.comm.synchronize")


def _object_to_array(obj: Any, pad_to: Optional[int] = None) -> np.ndarray:
    buf = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    if pad_to is not None:
        out = np.zeros(pad_to, dtype=np.uint8)
        out[: buf.size] = buf
        return out
    return buf


def all_gather(data: Any) -> List[Any]:
    """All-gather arbitrary picklable objects across hosts."""
    world = get_world_size()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    buf = _object_to_array(data)
    sizes = multihost_utils.process_allgather(np.array([buf.size], dtype=np.int64))
    max_size = int(sizes.max())
    padded = multihost_utils.process_allgather(
        _object_to_array(data, pad_to=max_size), tiled=False
    )
    return [
        pickle.loads(padded[i, : int(sizes[i, 0])].tobytes()) for i in range(world)
    ]


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather picklable objects onto rank ``dst`` (others receive [])."""
    gathered = all_gather(data)
    return gathered if get_rank() == dst else []


def shared_random_seed() -> int:
    """A random seed shared by all hosts (rank 0's draw wins)."""
    seed = np.random.randint(2**31)
    return int(all_gather(seed)[0])


def reduce_dict(input_dict: dict, average: bool = True) -> dict:
    """Reduce scalar dict values across hosts (mean by default)."""
    world = get_world_size()
    if world == 1:
        return dict(input_dict)
    gathered = all_gather(input_dict)
    keys = sorted(input_dict.keys())
    out = {}
    for k in keys:
        vals = [float(g[k]) for g in gathered]
        out[k] = sum(vals) / world if average else sum(vals)
    return out
