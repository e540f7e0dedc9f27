"""Segment reductions with static segment counts (torch_scatter equivalent).

The reference leans on torch_scatter/torch_geometric ``scatter(..., reduce=...)``
(e.g. ponder/models/ponder/ponder_indoor_base.py:214, spconv_unet_v1m1_base.py:276).
On TPU these are ``jax.ops.segment_*`` with a *static* ``num_segments`` so shapes
stay compile-time constant. Invalid rows should carry segment id == num_segments
(an overflow row that is allocated then dropped) or a negative id (ignored).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _clean_ids(segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    # route out-of-range / negative ids to a dump row
    bad = (segment_ids < 0) | (segment_ids >= num_segments)
    return jnp.where(bad, num_segments, segment_ids)


def segment_sum(data, segment_ids, num_segments: int):
    ids = _clean_ids(segment_ids, num_segments)
    out = jax.ops.segment_sum(data, ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_mean(data, segment_ids, num_segments: int):
    ids = _clean_ids(segment_ids, num_segments)
    total = jax.ops.segment_sum(data, ids, num_segments=num_segments + 1)
    count = jax.ops.segment_sum(
        jnp.ones(data.shape[:1], dtype=data.dtype), ids, num_segments=num_segments + 1
    )
    out = total / jnp.maximum(count[..., None] if data.ndim > 1 else count, 1.0)
    return out[:num_segments]


def segment_max(data, segment_ids, num_segments: int, initial=None):
    ids = _clean_ids(segment_ids, num_segments)
    out = jax.ops.segment_max(data, ids, num_segments=num_segments + 1)
    if initial is not None:
        # segment_max yields -inf for empty segments; replace with `initial`
        out = jnp.where(jnp.isneginf(out), initial, out)
    return out[:num_segments]


def segment_min(data, segment_ids, num_segments: int, initial=None):
    ids = _clean_ids(segment_ids, num_segments)
    out = jax.ops.segment_min(data, ids, num_segments=num_segments + 1)
    if initial is not None:
        out = jnp.where(jnp.isposinf(out), initial, out)
    return out[:num_segments]
