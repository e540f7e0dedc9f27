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
    pad: int = 16,
) -> DenseTable:
    X, Y, Z = (int(s) for s in spatial_shape)
    cells = int(batch_size) * X * Y * Z
    keys = ravel_single(coords, spatial_shape)
    n = coords.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)
    tgt = jnp.where(keys != INVALID_KEY, pad + keys, pad + cells + pad)
    # length multiple of RUN_PACK so lookup_runs can reshape to packed rows
    length = -(-(pad + cells + pad + 1) // RUN_PACK) * RUN_PACK
    grid = (
        jnp.full((length,), -1, jnp.int32)
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


# packing width for z-run lookups: the dense grid reshaped to rows of
# RUN_PACK int32 lets one 32 B row gather serve a whole contiguous z-run of
# queries (z is the fastest ravel axis), replacing kz scalar gathers. TPU
# gathers are descriptor-bound (~60M/s measured v5e) so fewer, wider reads win.
RUN_PACK = 8


def lookup_runs(
    table: DenseTable,
    base_coords: jnp.ndarray,
    spatial_shape: Sequence[int],
    run_len: int,
) -> jnp.ndarray:
    """Query ``run_len`` z-consecutive cells per row against a dense table.

    ``base_coords`` is (M, 4) int32 (b, x, y, z0): the run covers z = z0 ..
    z0 + run_len - 1. Returns (M, run_len) int32 row indices (-1 = absent),
    exactly equal to ``run_len`` separate :func:`lookup` calls.

    Two packed-row gathers (2 x RUN_PACK lanes around the run) replace
    ``run_len`` scalar gathers; per-lane extraction is a one-hot select on
    the VPU. Requires ``run_len <= RUN_PACK`` and pad >= RUN_PACK + run_len.
    """
    assert run_len <= RUN_PACK
    X, Y, Z = (int(s) for s in spatial_shape)
    b, x, y, z0 = (base_coords[:, i] for i in range(4))
    # base validity is per-(b, x, y) column; z validity is per-lane below.
    n_batch = table.num_cells // (X * Y * Z)
    col_ok = (
        (b >= 0) & (b < n_batch)
        & (x >= 0) & (x < X) & (y >= 0) & (y < Y)
    )
    zc = jnp.clip(z0, 0, Z - 1)  # a surely-in-column anchor cell
    key = ((b * X + x) * Y + y) * Z + zc
    base = jnp.where(col_ok, table.pad + key, table.pad + table.num_cells)
    grid8 = table.grid.reshape(-1, RUN_PACK)
    r0 = jnp.clip(base // RUN_PACK, 0, grid8.shape[0] - 2)
    combo = jnp.concatenate([grid8[r0], grid8[r0 + 1]], axis=1)  # (M, 16)
    # lane of z0+dz inside combo: (base % RUN_PACK) + (z0 + dz - zc)
    lane0 = base % RUN_PACK + (z0 - zc)
    lanes = jnp.arange(2 * RUN_PACK, dtype=jnp.int32)
    outs = []
    for dz in range(run_len):
        z = z0 + dz
        ok = col_ok & (z >= 0) & (z < Z)
        lane = lane0 + dz
        v = jnp.sum(
            jnp.where(lanes[None, :] == lane[:, None], combo, 0), axis=1
        )
        # absent cells hold -1 already; the one-hot sum yields 0 for
        # out-of-range lanes, so gate on ok to restore -1 semantics
        outs.append(jnp.where(ok, v, -1))
    return jnp.stack(outs, axis=1)


class PackedTable(NamedTuple):
    """Rank + occupancy-bitmap dense table for z-run rulebook lookups.

    ``packed[pad + cell] = rank(cell) * 256 + occ_bits(cell)`` where
    ``rank(cell)`` is the number of occupied cells with smaller ravel key
    (an exclusive cumsum) and ``occ_bits(cell)`` bit ``d`` is the occupancy
    of ``cell + d`` (d < 8). One scalar gather at a z-run's base cell then
    yields every tap in the run: occupancy from the bitmap, and the row
    index as ``rank + popcount(occ_bits & ((1 << d) - 1))`` — cells between
    the base and tap d are exactly the bitmap's prefix bits.

    VALIDITY CONTRACT: ranks equal original row indices iff the coordinate
    rows are sorted ascending by ravel key with padding rows last — which
    every backbone guarantees (ops.sparse.sort_by_key at entry,
    unique_voxels thereafter). For unsorted rows use the plain DenseTable.
    """

    packed: jnp.ndarray  # (pad + cells + pad + 1,) int32, RUN_PACK-aligned
    num_cells: int
    pad: int


def _exclusive_cumsum_01(occ: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumsum of a 0/1 int32 vector via a blocked triangular
    matmul: XLA's native cumsum runs log-N passes over the full array
    (~30 ms at 113M cells on v5e); a (G, 256) @ strict-upper-triangular
    (256, 256) bf16 MXU pass + a small block-offset scan is ~10x cheaper.
    bf16 is exact for the 0..256 within-block counts."""
    blk = 256
    n = occ.shape[0]
    if n < blk * 4:
        return jnp.cumsum(occ) - occ
    n_pad = -(-n // blk) * blk
    padded = jnp.pad(occ, (0, n_pad - n)) if n_pad != n else occ
    x = padded.reshape(-1, blk).astype(jnp.bfloat16)
    tri = jnp.triu(jnp.ones((blk, blk), jnp.bfloat16), k=1)  # i < j
    within = jax.lax.dot_general(
        x, tri, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # (G, blk) exclusive within-block
    sums = jnp.sum(x.astype(jnp.int32), axis=1)  # (G,)
    offsets = jnp.cumsum(sums) - sums
    return (within + offsets[:, None]).reshape(n_pad)[:n]


def build_packed_table(
    coords: jnp.ndarray, spatial_shape: Sequence[int], batch_size: int,
    pad: int = 16,
) -> PackedTable:
    X, Y, Z = (int(s) for s in spatial_shape)
    cells = int(batch_size) * X * Y * Z
    keys = ravel_single(coords, spatial_shape)
    ok = keys != INVALID_KEY
    length = -(-(pad + cells + pad + 1) // RUN_PACK) * RUN_PACK
    tgt = jnp.where(ok, pad + keys, pad + cells + pad)
    occ = (
        jnp.zeros((length,), jnp.int32).at[tgt].add(jnp.where(ok, 1, 0))
    )
    occ = occ.at[pad + cells + pad].set(0)  # clear the dump slot
    rank = _exclusive_cumsum_01(occ)
    bits = jnp.zeros((length,), jnp.int32)
    for d in range(8):
        shifted = jnp.roll(occ, -d)  # occ[cell + d]; wraparound cells are
        bits = bits + (shifted << d)  # beyond pad and masked per-z anyway
    return PackedTable(rank * 256 + bits, cells, pad)


def lookup_runs_packed(
    table: PackedTable,
    base_coords: jnp.ndarray,
    spatial_shape: Sequence[int],
    run_len: int,
) -> jnp.ndarray:
    """Like :func:`lookup_runs` but ONE scalar gather per run (see
    :class:`PackedTable`; requires key-sorted coordinate rows)."""
    assert run_len <= 8
    X, Y, Z = (int(s) for s in spatial_shape)
    b, x, y, z0 = (base_coords[:, i] for i in range(4))
    n_batch = table.num_cells // (X * Y * Z)
    col_ok = (
        (b >= 0) & (b < n_batch)
        & (x >= 0) & (x < X) & (y >= 0) & (y < Y)
    )
    zc = jnp.clip(z0, 0, Z - 1)
    key = ((b * X + x) * Y + y) * Z + zc
    base = jnp.where(col_ok, table.pad + key, table.pad + table.num_cells)
    packed = table.packed[base]  # (M,) — the one gather
    rank = packed >> 8
    occ = packed & 0xFF
    outs = []
    for dz in range(run_len):
        z = z0 + dz
        bit = z - zc  # in [0, 8) for every valid tap
        ok = col_ok & (z >= 0) & (z < Z)
        present = ((occ >> bit) & 1) == 1
        prefix = jax.lax.population_count(occ & ((1 << bit) - 1))
        outs.append(jnp.where(ok & present, rank + prefix, -1))
    return jnp.stack(outs, axis=1)


class BitmapTable(NamedTuple):
    """Occupancy-bitmap rank table: 32 cells per uint32 word + prefix popcounts.

    Row ``i`` of ``fused`` is ``[prefix_i, word_i, word_{i+1}, 0]`` (int32):
    ``word_i`` holds occupancy bits of cells ``[32 i, 32 i + 32)`` and
    ``prefix_i`` the number of occupied cells before ``32 i``. One 16 B row
    gather answers rank + an 8-cell occupancy window for any cell — replacing
    the int32-per-cell :class:`PackedTable` (whose 4 B/cell grid was both the
    dominant rulebook-build cost and a ~0.5 GB HBM transient at bench shapes;
    this is 16x smaller and measured ~2.2x faster to query on v5e, because
    TPU gather rate degrades with operand size).

    VALIDITY CONTRACT: same as :class:`PackedTable` — ranks equal original row
    indices iff coordinate rows are sorted ascending by ravel key with padding
    rows last.
    """

    fused: jnp.ndarray  # (W + 1, 4) int32; last row = dump for invalid queries
    num_cells: int  # static


def build_bitmap_table(
    coords: jnp.ndarray, spatial_shape: Sequence[int], batch_size: int
) -> BitmapTable:
    X, Y, Z = (int(s) for s in spatial_shape)
    cells = int(batch_size) * X * Y * Z
    W = -(-cells // 32)
    keys = ravel_single(coords, spatial_shape)
    ok = keys != INVALID_KEY
    word_idx = jnp.where(ok, keys >> 5, W + 1)  # dump word for padding rows
    bit = (keys & 31).astype(jnp.uint32)
    words = (
        jnp.zeros((W + 2,), jnp.uint32)
        .at[word_idx]
        .add(jnp.where(ok, jnp.uint32(1) << bit, jnp.uint32(0)))
    )
    pc = jax.lax.population_count(words[:W]).astype(jnp.int32)
    prefix = jnp.cumsum(pc) - pc
    fused = jnp.stack(
        [
            prefix,
            words[:W].astype(jnp.int32),
            words[1 : W + 1].astype(jnp.int32),
            jnp.zeros_like(prefix),
        ],
        axis=1,
    )
    fused = jnp.concatenate([fused, jnp.zeros((1, 4), jnp.int32)], axis=0)
    return BitmapTable(fused, cells)


def bitmap_rank_occ(
    table: BitmapTable,
    base_coords: jnp.ndarray,
    spatial_shape: Sequence[int],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rank + 8-cell occupancy window at each (b, x, y, z0) base cell.

    Returns ``(rank (M,), occ8 (M,), col_ok (M,) bool)``: ``rank`` is the
    number of occupied cells with smaller ravel key than the base cell (valid
    whether or not the base cell is occupied), bit ``d`` of ``occ8`` is the
    occupancy of ``z0 + d`` *ignoring z-range wrap* — callers must mask taps
    with ``0 <= z0 + d < Z`` (wrapped bits alias neighboring (x, y) columns).
    ``col_ok`` is False for out-of-range (b, x, y) or negative/padding rows
    (then rank points at the zeroed dump row).
    """
    X, Y, Z = (int(s) for s in spatial_shape)
    b, x, y, z0 = (base_coords[:, i] for i in range(4))
    n_batch = table.num_cells // (X * Y * Z)
    col_ok = (
        (b >= 0) & (b < n_batch) & (x >= 0) & (x < X) & (y >= 0) & (y < Y)
    )
    zc = jnp.clip(z0, 0, Z - 1)
    cell = ((b * X + x) * Y + y) * Z + zc
    W = table.fused.shape[0] - 1
    i = jnp.where(col_ok, cell >> 5, W)
    row = table.fused[i]  # (M, 4) — the one gather
    s = (cell & 31).astype(jnp.uint32)
    prefix = row[:, 0]
    w0 = row[:, 1].astype(jnp.uint32)
    w1 = row[:, 2].astype(jnp.uint32)
    rank = prefix + jax.lax.population_count(
        w0 & ((jnp.uint32(1) << s) - 1)
    ).astype(jnp.int32)
    lo = w0 >> s
    hi = jnp.where(s > 24, w1 << (jnp.uint32(32) - s), jnp.uint32(0))
    occ8 = ((lo | hi) & 0xFF).astype(jnp.int32)
    # shift the window so bit d refers to z0 + d even when z0 was clamped
    # (z0 in {-1, -2} for edge taps): occ8 covers zc + [0, 8); when z0 < 0 the
    # low bits are invalid anyway (z out of range) so shifting left aligns
    # bit d = z0 + d for the in-range part as long as zc - z0 <= 2 (kz <= 8
    # keeps every in-range tap within the window for odd centered kernels).
    shift = (zc - z0).astype(jnp.uint32)
    occ8 = jnp.where(
        shift > 0, (occ8 << shift) & 0xFF, occ8
    )
    rank = jnp.where(col_ok, rank, 0)
    return rank, occ8, col_ok


def lookup_runs_bitmap(
    table: BitmapTable,
    base_coords: jnp.ndarray,
    spatial_shape: Sequence[int],
    run_len: int,
) -> jnp.ndarray:
    """Drop-in equivalent of :func:`lookup_runs_packed` over a BitmapTable:
    (M, run_len) int32 row indices (-1 = absent), ONE 16 B row gather per run.
    Requires key-sorted coordinate rows (see :class:`BitmapTable`)."""
    assert run_len <= 8
    Z = int(spatial_shape[2])
    rank, occ8, col_ok = bitmap_rank_occ(table, base_coords, spatial_shape)
    z0 = base_coords[:, 3]
    outs = []
    for dz in range(run_len):
        z = z0 + dz
        ok = col_ok & (z >= 0) & (z < Z)
        present = ((occ8 >> dz) & 1) == 1
        prefix = jax.lax.population_count(occ8 & ((1 << dz) - 1))
        outs.append(jnp.where(ok & present, rank + prefix, -1))
    return jnp.stack(outs, axis=1)


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
