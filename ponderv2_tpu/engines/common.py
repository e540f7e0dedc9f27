"""Shared engine helpers (import-cycle-free leaf module)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def split_batch(batch: Dict[str, Any]):
    """Split a collated batch into (device arrays, static/host context)."""
    arrays, static = {}, {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            arrays[k] = v
        elif hasattr(v, "device"):  # already a jax array
            arrays[k] = v
        else:
            static[k] = v
    return arrays, static
