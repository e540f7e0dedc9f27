"""Shared engine helpers (import-cycle-free leaf module)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def _is_array(v) -> bool:
    return (isinstance(v, np.ndarray) and v.dtype != object) or hasattr(
        v, "device"  # already a jax array
    )


def split_batch(batch: Dict[str, Any]):
    """Split a collated batch into (device arrays, static/host context).

    Array-leaf pytrees (e.g. host-prefetched ``spunet_plans``) ride with the
    arrays — they are step inputs, not static context."""
    arrays, static = {}, {}
    for k, v in batch.items():
        if _is_array(v):
            arrays[k] = v
        else:
            leaves = (
                [] if isinstance(v, (str, bytes)) else jax.tree.leaves(v)
            )
            if leaves and all(_is_array(l) for l in leaves):
                arrays[k] = v
            else:
                static[k] = v
    return arrays, static
