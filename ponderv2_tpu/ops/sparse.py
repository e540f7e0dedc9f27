"""SparseTensor: fixed-capacity batched sparse voxel tensors, and voxel set ops.

The TPU-native replacement for spconv's ``SparseConvTensor``
(used at /root/reference/ponder/models/sparse_unet/spconv_unet_v1m1_base.py:249):
a padded ``(capacity, C)`` feature buffer plus ``(capacity, 4)`` int32 ``(b,x,y,z)``
coordinates. Padding rows have coords ``(-1,-1,-1,-1)`` and zero features; every op
preserves that invariant. All shapes are static — "number of active voxels" is a
*budget* (capacity), the true count lives in data as a mask.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from . import hashing
from .scatter import segment_mean, segment_sum


class SparseTensor(flax.struct.PyTreeNode):
    features: jnp.ndarray  # (N, C) float
    coords: jnp.ndarray  # (N, 4) int32 (b, x, y, z); padding rows all -1
    spatial_shape: Tuple[int, int, int] = flax.struct.field(pytree_node=False)
    batch_size: int = flax.struct.field(pytree_node=False)

    @property
    def mask(self) -> jnp.ndarray:
        return self.coords[:, 0] >= 0

    @property
    def capacity(self) -> int:
        return self.features.shape[0]

    @property
    def num_features(self) -> int:
        return self.features.shape[-1]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))

    def replace_features(self, features: jnp.ndarray) -> "SparseTensor":
        """Swap the feature buffer, re-zeroing padding rows."""
        features = jnp.where(self.mask[:, None], features, 0.0)
        return self.replace(features=features)


def make_sparse_tensor(
    features: jnp.ndarray,
    coords: jnp.ndarray,
    spatial_shape: Sequence[int],
    batch_size: int,
) -> SparseTensor:
    coords = coords.astype(jnp.int32)
    mask = coords[:, 0] >= 0
    coords = jnp.where(mask[:, None], coords, -1)
    features = jnp.where(mask[:, None], features, 0.0)
    return SparseTensor(
        features=features,
        coords=coords,
        spatial_shape=tuple(int(s) for s in spatial_shape),
        batch_size=int(batch_size),
    )


def unique_voxels(
    coords: jnp.ndarray,
    spatial_shape: Sequence[int],
    batch_size: int,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deduplicate (N,4) voxel coords into a fixed-capacity unique set.

    Returns ``(unique_coords (capacity,4) int32 padded with -1,
    inverse (N,) int32 mapping each input row to its unique id (or capacity when the
    row is padding/overflow), count () int32 number of unique voxels)``.

    Deterministic: unique voxels come out in ascending key order. If more than
    ``capacity`` unique voxels exist, the largest-key ones are dropped and their
    inverse ids point at the dump row ``capacity``.
    """
    n = coords.shape[0]
    table_mode_single = hashing.key_fits_int32(spatial_shape, batch_size)
    if table_mode_single:
        keys = hashing.ravel_single(coords, spatial_shape)
        order = jnp.argsort(keys)
        s_hi, s_lo = keys[order], None
        first = jnp.concatenate(
            [jnp.array([True]), s_hi[1:] != s_hi[:-1]]
        )
        valid = s_hi != hashing.INVALID_KEY
    else:
        k_hi, k_lo = hashing.ravel_pair(coords, spatial_shape)
        order = jnp.lexsort((k_lo, k_hi))
        s_hi, s_lo = k_hi[order], k_lo[order]
        first = jnp.concatenate(
            [
                jnp.array([True]),
                (s_hi[1:] != s_hi[:-1]) | (s_lo[1:] != s_lo[:-1]),
            ]
        )
        valid = s_hi != hashing.INVALID_KEY
    is_new = first & valid
    uid_sorted = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # id within sorted order
    count = jnp.sum(is_new.astype(jnp.int32))
    uid_sorted = jnp.where(valid & (uid_sorted < capacity), uid_sorted, capacity)

    # representative (first occurrence) coords per unique id
    scatter_ids = jnp.where(is_new, uid_sorted, capacity)
    unique_coords = jnp.full((capacity + 1, 4), -1, dtype=jnp.int32)
    unique_coords = unique_coords.at[scatter_ids].set(coords[order])[:capacity]

    inverse = jnp.zeros((n,), dtype=jnp.int32).at[order].set(uid_sorted)
    return unique_coords, inverse, jnp.minimum(count, capacity)


def voxel_pool(
    features: jnp.ndarray,
    coords: jnp.ndarray,
    spatial_shape: Sequence[int],
    batch_size: int,
    capacity: int,
    reduce: str = "mean",
) -> Tuple[SparseTensor, jnp.ndarray]:
    """Pool point/voxel features into unique voxels (scatter-mean by default).

    Returns the pooled SparseTensor and the (N,) inverse map (input row -> voxel id,
    ``capacity`` for dropped rows). This is the device-side GridSample/pooling
    primitive (reference: transform.py GridSample + to_dense scatter-mean pooling at
    ponder_indoor_base.py:177-342).
    """
    unique_coords, inverse, _ = unique_voxels(coords, spatial_shape, batch_size, capacity)
    if reduce == "mean":
        pooled = segment_mean(features, inverse, capacity)
    elif reduce == "sum":
        pooled = segment_sum(features, inverse, capacity)
    else:
        raise ValueError(f"unsupported reduce: {reduce}")
    st = make_sparse_tensor(pooled, unique_coords, spatial_shape, batch_size)
    return st, inverse


def to_dense(st: SparseTensor, channels_last: bool = False) -> jnp.ndarray:
    """Densify to (B, C, X, Y, Z) (or (B, X, Y, Z, C)); padding rows are dropped.

    Equivalent of spconv's ``SparseConvTensor.dense()``.
    """
    X, Y, Z = st.spatial_shape
    B = st.batch_size
    C = st.num_features
    flat = jnp.zeros((B * X * Y * Z + 1, C), dtype=st.features.dtype)
    b, x, y, z = st.coords[:, 0], st.coords[:, 1], st.coords[:, 2], st.coords[:, 3]
    idx = ((b * X + x) * Y + y) * Z + z
    idx = jnp.where(st.mask, idx, B * X * Y * Z)
    flat = flat.at[idx].add(st.features)
    dense = flat[:-1].reshape(B, X, Y, Z, C)
    if channels_last:
        return dense
    return jnp.transpose(dense, (0, 4, 1, 2, 3))


def offset2batch(offset: jnp.ndarray, total: int) -> jnp.ndarray:
    """Cumulative-offset batching -> per-row batch ids (reference models/utils.py:11).

    ``offset`` is the reference's (B,) cumulative point counts; ``total`` the padded
    row count. Rows past offset[-1] get batch id -1 (padding).
    """
    row = jnp.arange(total)
    batch = jnp.sum(row[:, None] >= offset[None, :], axis=1)
    return jnp.where(row < offset[-1], batch, -1).astype(jnp.int32)


def batch2offset(batch: jnp.ndarray, batch_size: int) -> jnp.ndarray:
    """Per-row batch ids -> cumulative offsets (reference models/utils.py:24)."""
    counts = segment_sum(
        jnp.ones_like(batch, dtype=jnp.int32), batch, batch_size
    )
    return jnp.cumsum(counts)


def maybe_sort_by_key(st: SparseTensor, assume_sorted: bool = False):
    """``sort_by_key`` unless the data pipeline already guarantees the order.

    ``datasets.utils.collate_fn`` pre-sorts rows by (batch, voxel key) on the
    host, so models built with ``assume_sorted=True`` skip the device argsort
    and the un-permute gather. Returns (st, None) in that case; callers treat
    ``inverse=None`` as the identity permutation."""
    if assume_sorted:
        return st, None
    return sort_by_key(st)


def sort_by_key(st: SparseTensor) -> Tuple[SparseTensor, jnp.ndarray]:
    """Sort rows by spatial key (padding last). Returns (sorted_st, inverse_perm).

    Rulebook gathers over key-sorted rows are near-monotonic (z-neighbors are
    adjacent, y-neighbors a fixed stride away), which XLA's TPU gather handles
    far better than shuffled rows. ``out_unsorted = out_sorted[inverse_perm]``
    restores the original row order for loss/label alignment.
    """
    from . import hashing

    if hashing.key_fits_int32(st.spatial_shape, st.batch_size):
        keys = hashing.ravel_single(st.coords, st.spatial_shape)
        perm = jnp.argsort(keys)
    else:
        hi, lo = hashing.ravel_pair(st.coords, st.spatial_shape)
        perm = jnp.lexsort((lo, hi))
    inverse = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype)
    )
    sorted_st = SparseTensor(
        features=st.features[perm],
        coords=st.coords[perm],
        spatial_shape=st.spatial_shape,
        batch_size=st.batch_size,
    )
    return sorted_st, inverse
