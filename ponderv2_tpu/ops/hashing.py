"""Exact voxel-coordinate keys and sorted-table lookup, XLA-friendly.

This is the substrate under sparse convolution and voxelization: batched integer
voxel coordinates ``(b, x, y, z)`` are mapped to sortable keys, and membership
queries resolve to indices by binary search over the sorted key table.

Design notes (TPU-first):
- No 64-bit anywhere. When ``B*X*Y*Z < 2**31`` (the common case; checked statically
  from the spatial shape) a single int32 ravel key + ``jnp.searchsorted`` is used.
  Otherwise keys are exact (hi, lo) int32 pairs resolved by a vectorized
  lexicographic binary search (static ``ceil(log2 N)+1`` iterations).
- Hashes are exact ravels, never lossy — a hash collision in a conv rulebook would
  silently corrupt features, so we do not use FNV-style hashing on the lookup path.
  (The reference's CUDA rulebooks have exact coordinate compare too;
  cf. /root/reference/libs/pointops and spconv usage in
  ponder/models/sparse_unet/spconv_unet_v1m1_base.py:249.)
- Invalid/padding rows carry the sentinel key ``INVALID_KEY`` = int32 max, which
  sorts to the end and never matches a query.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

INVALID_KEY = jnp.iinfo(jnp.int32).max

# Dense-grid membership tables beat sorted-key lookups by ~an order of
# magnitude on TPU (no multi-million-element XLA sorts; queries are direct
# int32 reads), at the cost of a (B*X*Y*Z+1,) int32 HBM transient. Used
# whenever the cell count fits this budget (cells, not bytes; 4 B/cell).
DENSE_GRID_LIMIT = int(
    os.environ.get("PONDER_DENSE_GRID_LIMIT", 192 * 1024 * 1024)
)


def key_fits_int32(spatial_shape: Sequence[int], batch_size: int) -> bool:
    X, Y, Z = spatial_shape
    return batch_size * X * Y * Z < 2**31


def ravel_single(coords: jnp.ndarray, spatial_shape: Sequence[int]) -> jnp.ndarray:
    """(N, 4) int32 bxyz -> (N,) int32 key. Requires key_fits_int32. Rows with any
    negative coordinate (padding) map to INVALID_KEY."""
    X, Y, Z = (int(s) for s in spatial_shape)
    b, x, y, z = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    key = ((b * X + x) * Y + y) * Z + z
    valid = jnp.all((coords >= 0), axis=1) & (x < X) & (y < Y) & (z < Z)
    return jnp.where(valid, key, INVALID_KEY)


def ravel_pair(
    coords: jnp.ndarray, spatial_shape: Sequence[int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, 4) -> ((N,) hi, (N,) lo) exact pair keys; padding -> (INVALID, INVALID)."""
    X, Y, Z = (int(s) for s in spatial_shape)
    b, x, y, z = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    hi = b * X + x
    lo = y * Z + z
    valid = jnp.all(coords >= 0, axis=1) & (x < X) & (y < Y) & (z < Z)
    return (
        jnp.where(valid, hi, INVALID_KEY),
        jnp.where(valid, lo, INVALID_KEY),
    )


class HashTable(NamedTuple):
    """Sorted key table over a fixed-capacity coordinate set."""

    sorted_hi: jnp.ndarray  # (N,) int32; for single-key mode this IS the key
    sorted_lo: jnp.ndarray  # (N,) int32; all-zeros in single-key mode
    perm: jnp.ndarray  # (N,) int32: sorted position -> original row
    single: bool  # static: single int32 key mode


class DenseTable(NamedTuple):
    """Exact dense voxel-grid membership table: grid[pad + key] = row or -1.

    The grid carries ``pad`` sentinel (-1) cells on each side so z-window
    slice reads (``lookup_zwindow``) never need clamping, plus a dump region
    at the end for invalid queries."""

    grid: jnp.ndarray  # (pad + num_cells + pad + 1,) int32
    num_cells: int  # static
    pad: int  # static


def dense_table_fits(spatial_shape: Sequence[int], batch_size: int) -> bool:
    X, Y, Z = (int(s) for s in spatial_shape)
    cells = int(batch_size) * X * Y * Z
    return cells <= DENSE_GRID_LIMIT and key_fits_int32(spatial_shape, batch_size)


def build_dense_table(
    coords: jnp.ndarray, spatial_shape: Sequence[int], batch_size: int,
    pad: int = 8,
) -> DenseTable:
    X, Y, Z = (int(s) for s in spatial_shape)
    cells = int(batch_size) * X * Y * Z
    keys = ravel_single(coords, spatial_shape)
    n = coords.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)
    tgt = jnp.where(keys != INVALID_KEY, pad + keys, pad + cells + pad)
    grid = (
        jnp.full((pad + cells + pad + 1,), -1, jnp.int32)
        .at[tgt]
        .set(jnp.where(keys != INVALID_KEY, rows, -1))
    )
    return DenseTable(grid, cells, pad)


def build_table(
    coords: jnp.ndarray,
    spatial_shape: Sequence[int],
    batch_size: int,
    prefer_dense: bool = True,
) -> Union["HashTable", DenseTable]:
    """Membership table for rulebook construction: dense grid when it fits
    (no sorts at all), else a sorted key table."""
    if prefer_dense and dense_table_fits(spatial_shape, batch_size):
        return build_dense_table(coords, spatial_shape, batch_size)
    if key_fits_int32(spatial_shape, batch_size):
        keys = ravel_single(coords, spatial_shape)
        order = jnp.argsort(keys)
        return HashTable(keys[order], jnp.zeros_like(keys), order.astype(jnp.int32), True)
    hi, lo = ravel_pair(coords, spatial_shape)
    order = jnp.lexsort((lo, hi))
    return HashTable(hi[order], lo[order], order.astype(jnp.int32), False)


def _lex_searchsorted(
    sorted_hi: jnp.ndarray, sorted_lo: jnp.ndarray, q_hi: jnp.ndarray, q_lo: jnp.ndarray
) -> jnp.ndarray:
    """Vectorized left-searchsorted over (hi, lo) pairs. Static iteration count."""
    n = sorted_hi.shape[0]
    iters = max(int(math.ceil(math.log2(max(n, 2)))) + 1, 1)
    lo_b = jnp.zeros_like(q_hi)
    hi_b = jnp.full_like(q_hi, n)

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) // 2
        mid_c = jnp.clip(mid, 0, n - 1)
        k_hi = sorted_hi[mid_c]
        k_lo = sorted_lo[mid_c]
        less = (k_hi < q_hi) | ((k_hi == q_hi) & (k_lo < q_lo))
        return jnp.where(less, mid + 1, lo_b), jnp.where(less, hi_b, mid)

    lo_b, _ = jax.lax.fori_loop(0, iters, body, (lo_b, hi_b))
    return lo_b


def lookup(
    table, coords: jnp.ndarray, spatial_shape: Sequence[int]
) -> jnp.ndarray:
    """Query (M, 4) coords against the table -> (M,) int32 original-row index or -1."""
    if isinstance(table, DenseTable):
        q = ravel_single(coords, spatial_shape)
        ok = (q != INVALID_KEY) & (q < table.num_cells)
        q = jnp.where(ok, table.pad + q, table.pad + table.num_cells)
        return table.grid[q]
    n = table.sorted_hi.shape[0]
    if table.single:
        q = ravel_single(coords, spatial_shape)
        # method="sort" (one fused sort over keys+queries) is ~9x faster on TPU
        # than the default sequential binary-search scan (measured v5e)
        pos = jnp.searchsorted(table.sorted_hi, q, method="sort")
        pos_c = jnp.clip(pos, 0, n - 1)
        found = (table.sorted_hi[pos_c] == q) & (q != INVALID_KEY) & (pos < n)
    else:
        q_hi, q_lo = ravel_pair(coords, spatial_shape)
        pos = _lex_searchsorted(table.sorted_hi, table.sorted_lo, q_hi, q_lo)
        pos_c = jnp.clip(pos, 0, n - 1)
        found = (
            (table.sorted_hi[pos_c] == q_hi)
            & (table.sorted_lo[pos_c] == q_lo)
            & (q_hi != INVALID_KEY)
            & (pos < n)
        )
    return jnp.where(found, table.perm[pos_c], -1)


def fnv_hash(coords: jnp.ndarray) -> jnp.ndarray:
    """FNV-1a 32-bit hash of (N, D) int coordinates (uint32 wrap-around).

    Only for *randomized bucketing* (e.g. hashed voxel ids in data transforms,
    mirroring GridSample's fnv mode at reference transform.py:1078-1213) — never for
    exact-lookup tables (see module docstring).
    """
    x = coords.astype(jnp.uint32)
    h = jnp.full(x.shape[:-1], 2166136261, dtype=jnp.uint32)
    for d in range(coords.shape[-1]):
        h = (h ^ x[..., d]) * jnp.uint32(16777619)
    return h
