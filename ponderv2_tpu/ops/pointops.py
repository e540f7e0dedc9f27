"""Point-cloud ops: KNN, ball query, FPS, grouping, interpolation, attention steps.

TPU-native replacement for the reference's pointops CUDA library
(/root/reference/libs/pointops/functions/*): everything is expressed as masked,
fixed-shape jnp — distance tiles ride the MXU, selections are top_k, iteration is
lax loops. Batched point clouds use per-row int32 batch ids (padding = -1), the
static-shape analog of the reference's cumulative ``offset`` convention
(adapters in ops.sparse: offset2batch / batch2offset).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = 1e10


def _pairwise_sqdist(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """(M,3),(N,3) -> (M,N) squared distances, MXU-friendly form."""
    qq = jnp.sum(q * q, axis=1, keepdims=True)
    rr = jnp.sum(r * r, axis=1, keepdims=True)
    qr = jnp.dot(q, r.T, preferred_element_type=jnp.float32)
    return qq + rr.T - 2.0 * qr


def knn_query(
    k: int,
    ref_xyz: jnp.ndarray,
    ref_batch: jnp.ndarray,
    query_xyz: Optional[jnp.ndarray] = None,
    query_batch: Optional[jnp.ndarray] = None,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Brute-force k-nearest-neighbors within matching batch elements.

    Returns (idx (M, k) int32 into ref rows, sqdist (M, k)). Rows with an invalid
    query (batch -1) or fewer than k valid same-batch refs get the nearest valid
    ref repeated (distance still correct), matching the reference kernel's
    behaviour of always returning k indices
    (libs/pointops/src/knn_query/knn_query_cuda_kernel.cu).
    """
    if query_xyz is None:
        query_xyz, query_batch = ref_xyz, ref_batch
    m = query_xyz.shape[0]
    pad = (-m) % chunk
    q_xyz = jnp.pad(query_xyz, ((0, pad), (0, 0)))
    q_batch = jnp.pad(query_batch, (0, pad), constant_values=-1)
    n_chunks = q_xyz.shape[0] // chunk

    def one_chunk(carry, inputs):
        cq, cb = inputs
        d = _pairwise_sqdist(cq, ref_xyz)
        invalid = (cb[:, None] != ref_batch[None, :]) | (ref_batch[None, :] < 0)
        d = jnp.where(invalid, _BIG, d)
        neg_d, idx = jax.lax.top_k(-d, k)
        return carry, (idx.astype(jnp.int32), -neg_d)

    _, (idx, dist) = jax.lax.scan(
        one_chunk,
        None,
        (
            q_xyz.reshape(n_chunks, chunk, 3),
            q_batch.reshape(n_chunks, chunk),
        ),
    )
    return idx.reshape(-1, k)[:m], dist.reshape(-1, k)[:m]


def ball_query(
    radius: float,
    nsample: int,
    ref_xyz: jnp.ndarray,
    ref_batch: jnp.ndarray,
    query_xyz: jnp.ndarray,
    query_batch: jnp.ndarray,
    min_radius: float = 0.0,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-radius neighbor query (reference ball_query semantics: the first
    ``nsample`` in-radius neighbors; short lists are filled with the first hit).

    Returns (idx (M, nsample) int32, sqdist (M, nsample)).
    """
    m = query_xyz.shape[0]
    pad = (-m) % chunk
    q_xyz = jnp.pad(query_xyz, ((0, pad), (0, 0)))
    q_batch = jnp.pad(query_batch, (0, pad), constant_values=-1)
    n_chunks = q_xyz.shape[0] // chunk
    r2_max, r2_min = radius * radius, min_radius * min_radius

    def one_chunk(carry, inputs):
        cq, cb = inputs
        d = _pairwise_sqdist(cq, ref_xyz)
        bad = (
            (cb[:, None] != ref_batch[None, :])
            | (ref_batch[None, :] < 0)
            | (d > r2_max)
            | (d < r2_min)
        )
        # prefer in-radius hits in *index order* (reference takes first hits):
        # rank = index when good else BIG, take nsample smallest.
        n = ref_xyz.shape[0]
        order = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32), d.shape)
        rank = jnp.where(bad, _BIG, order)
        neg_rank, idx = jax.lax.top_k(-rank, nsample)
        hit = -neg_rank < _BIG
        first = idx[:, :1]
        idx = jnp.where(hit, idx, first)
        dsel = jnp.take_along_axis(d, idx, axis=1)
        return carry, (idx.astype(jnp.int32), dsel)

    _, (idx, dist) = jax.lax.scan(
        one_chunk,
        None,
        (q_xyz.reshape(n_chunks, chunk, 3), q_batch.reshape(n_chunks, chunk)),
    )
    return idx.reshape(-1, nsample)[:m], dist.reshape(-1, nsample)[:m]


def random_ball_query(
    rng: jax.Array,
    radius: float,
    nsample: int,
    ref_xyz: jnp.ndarray,
    ref_batch: jnp.ndarray,
    query_xyz: jnp.ndarray,
    query_batch: jnp.ndarray,
    min_radius: float = 0.0,
    chunk: int = 2048,
    rank_of_row: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random-subset ball query (reference random_ball_query,
    libs/pointops/functions/query.py:62-107 + src/random_ball_query/*.cu):
    refs are scanned in a per-batch random permutation and the first
    ``nsample`` hits are kept, where a hit is ``d2 <= 1e-5`` (self) or
    ``min_r2 <= d2 < max_r2``. Short lists are filled with idx -1 and
    dist2 1e10 (returned dist is sqrt, matching the reference wrapper).

    The per-batch permutation is realized as a single random key-sort: rows
    get a random strictly-increasing-in-batch rank, so scanning by rank
    within a batch is a uniform permutation of that batch's rows.
    """
    m = query_xyz.shape[0]
    n = ref_xyz.shape[0]
    if rank_of_row is None:
        # random rank of each ref row; only the relative order within a batch
        # matters, and a global uniform permutation restricted to one batch's
        # rows is a uniform permutation of them
        perm = jnp.argsort(jax.random.uniform(rng, (n,)))
        rank_of_row = jnp.zeros((n,), jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32)
        )
    pad = (-m) % chunk
    q_xyz = jnp.pad(query_xyz, ((0, pad), (0, 0)))
    q_batch = jnp.pad(query_batch, (0, pad), constant_values=-1)
    n_chunks = q_xyz.shape[0] // chunk
    r2_max, r2_min = radius * radius, min_radius * min_radius

    def one_chunk(carry, inputs):
        cq, cb = inputs
        d = _pairwise_sqdist(cq, ref_xyz)
        hit = (
            (cb[:, None] == ref_batch[None, :])
            & (ref_batch[None, :] >= 0)
            & ((d <= 1e-5) | ((d >= r2_min) & (d < r2_max)))
        )
        rank = jnp.where(hit, rank_of_row[None, :].astype(jnp.float32), _BIG)
        neg_rank, idx = jax.lax.top_k(-rank, nsample)
        found = -neg_rank < _BIG
        dsel = jnp.take_along_axis(d, idx, axis=1)
        idx = jnp.where(found, idx, -1).astype(jnp.int32)
        dsel = jnp.where(found, dsel, _BIG)
        return carry, (idx, dsel)

    _, (idx, dist2) = jax.lax.scan(
        one_chunk,
        None,
        (q_xyz.reshape(n_chunks, chunk, 3), q_batch.reshape(n_chunks, chunk)),
    )
    idx = idx.reshape(-1, nsample)[:m]
    dist2 = dist2.reshape(-1, nsample)[:m]
    return idx, jnp.sqrt(jnp.maximum(dist2, 0.0))


def _group(feat, xyz, new_xyz, idx, with_xyz):
    """Shared grouping body (reference libs/pointops/functions/utils.py:5-121):
    gather neighbor features by idx; ``with_xyz`` prepends neighbor positions
    relative to the query point. idx -1 rows produce zeros."""
    safe = jnp.maximum(idx, 0)
    valid = (idx >= 0)[..., None]
    grouped = jnp.where(valid, feat[safe], 0.0)  # (m, nsample, c)
    if with_xyz:
        rel = jnp.where(valid, xyz[safe] - new_xyz[:, None, :], 0.0)
        grouped = jnp.concatenate([rel, grouped], axis=-1)
    return grouped


def knn_query_and_group(
    feat: jnp.ndarray,
    xyz: jnp.ndarray,
    batch: jnp.ndarray,
    new_xyz: Optional[jnp.ndarray] = None,
    new_batch: Optional[jnp.ndarray] = None,
    idx: Optional[jnp.ndarray] = None,
    nsample: Optional[int] = None,
    with_xyz: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KNN + grouping composite (reference utils.py:5-23)."""
    if new_xyz is None:
        new_xyz, new_batch = xyz, batch
    if idx is None:
        assert nsample is not None
        idx, _ = knn_query(nsample, xyz, batch, new_xyz, new_batch)
    return _group(feat, xyz, new_xyz, idx, with_xyz), idx


def ball_query_and_group(
    feat: jnp.ndarray,
    xyz: jnp.ndarray,
    batch: jnp.ndarray,
    new_xyz: Optional[jnp.ndarray] = None,
    new_batch: Optional[jnp.ndarray] = None,
    idx: Optional[jnp.ndarray] = None,
    max_radius: Optional[float] = None,
    min_radius: float = 0.0,
    nsample: Optional[int] = None,
    with_xyz: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ball query + grouping composite (reference utils.py:26-45)."""
    if new_xyz is None:
        new_xyz, new_batch = xyz, batch
    if idx is None:
        assert nsample is not None and max_radius is not None
        idx, _ = ball_query(
            max_radius, nsample, xyz, batch, new_xyz, new_batch,
            min_radius=min_radius,
        )
    return _group(feat, xyz, new_xyz, idx, with_xyz), idx


def farthest_point_sampling(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    n_samples: int,
) -> jnp.ndarray:
    """Iterative FPS over one point set (masked rows excluded).

    Returns (n_samples,) int32 indices. Batched use: vmap over scenes. The loop is
    a lax.fori_loop with a running min-distance field (same algorithm as the
    reference kernel, libs/pointops/src/sampling/sampling_cuda_kernel.cu).
    """
    n = xyz.shape[0]
    start = jnp.argmax(mask)  # first valid point
    dist = jnp.where(mask, _BIG, -_BIG)
    idx0 = jnp.zeros((n_samples,), jnp.int32).at[0].set(start.astype(jnp.int32))

    def body(i, carry):
        idx, dist = carry
        last = xyz[idx[i - 1]]
        d = jnp.sum((xyz - last[None, :]) ** 2, axis=1)
        dist = jnp.minimum(dist, jnp.where(mask, d, -_BIG))
        nxt = jnp.argmax(dist).astype(jnp.int32)
        return idx.at[i].set(nxt), dist

    idx, _ = jax.lax.fori_loop(1, n_samples, body, (idx0, dist))
    return idx


def grouping(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features: (N, C), (M, k) -> (M, k, C).

    Backward (scatter-add) comes from JAX autodiff — the reference implements it
    by hand (libs/pointops/src/grouping/grouping_cuda_kernel.cu).
    """
    return features[idx]


def interpolation(
    src_xyz: jnp.ndarray,
    src_batch: jnp.ndarray,
    dst_xyz: jnp.ndarray,
    dst_batch: jnp.ndarray,
    features: jnp.ndarray,
    k: int = 3,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Inverse-distance-weighted kNN feature interpolation (src -> dst).

    Reference: libs/pointops/functions/interpolation.py:8-59.
    """
    idx, sqdist = knn_query(k, src_xyz, src_batch, dst_xyz, dst_batch)
    w = 1.0 / (jnp.sqrt(jnp.maximum(sqdist, 0.0)) + eps)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    return jnp.sum(features[idx] * w[..., None], axis=1)


def subtraction(
    feat_q: jnp.ndarray, feat_r: jnp.ndarray, idx: jnp.ndarray
) -> jnp.ndarray:
    """Pairwise neighborhood subtraction: (M,C),(N,C),(M,k) -> (M,k,C)."""
    return feat_q[:, None, :] - feat_r[idx]


def aggregation(
    feat: jnp.ndarray,
    position: jnp.ndarray,
    weight: jnp.ndarray,
    idx: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted neighbor aggregation (point-transformer style).

    out[m] = sum_k (feat[idx[m,k]] + position[m,k]) * weight[m,k] with weight
    broadcast over channel groups (C = G * weight_channels).
    Reference: libs/pointops/functions/aggregation.py.
    """
    m, k = idx.shape
    c = feat.shape[1]
    wc = weight.shape[2]
    gathered = feat[idx] + position  # (M, k, C)
    gathered = gathered.reshape(m, k, wc, c // wc)
    return jnp.sum(gathered * weight[..., None], axis=1).reshape(m, c)


def attention_relation_step(
    query: jnp.ndarray,
    key: jnp.ndarray,
    weight: jnp.ndarray,
    index_target: jnp.ndarray,
    index_refer: jnp.ndarray,
) -> jnp.ndarray:
    """Sparse attention relation: out[i] = q[it[i]] * k[ir[i]] * w (per channel-group).

    Reference: libs/pointops/functions/attention.py:11-60.
    """
    return query[index_target] * key[index_refer] * weight[None, :]


def attention_fusion_step(
    weight: jnp.ndarray,
    value: jnp.ndarray,
    index_target: jnp.ndarray,
    index_refer: jnp.ndarray,
    num_outputs: int,
) -> jnp.ndarray:
    """Sparse attention fusion: out[t] += w[i] * v[ir[i]] scattered by target.

    Reference: libs/pointops/functions/attention.py:62-119.
    """
    contrib = weight * value[index_refer]
    return jax.ops.segment_sum(contrib, index_target, num_segments=num_outputs)
