"""Instance clustering: radius-graph connected components (host-side).

Reference: the pointgroup_ops CUDA ballquery + C++ BFS
(/root/reference/libs/pointgroup_ops/src/bfs_cluster.cpp:40-145, used at
ponder/models/point_group/point_group_v1m1_base.py:119-131). Clustering is
inference-only postprocessing, so it stays off the device hot path: a
scipy-KDTree radius graph + union-find on host, grouping same-class points into
instance proposals. Mirrors ``ballquery_batch_p`` + ``bfs_cluster`` semantics:
two points connect iff within ``radius`` AND sharing a semantic class.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


class _UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n)

    def find(self, x: int) -> int:
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def bfs_cluster(
    coords: np.ndarray,
    classes: np.ndarray,
    radius: float = 0.03,
    min_points: int = 50,
) -> Tuple[np.ndarray, int]:
    """Cluster ``coords`` (M, 3) with per-point ``classes`` (M,) into instances.

    Returns (instance_ids (M,), num_instances); unclustered points get -1.
    """
    from scipy.spatial import cKDTree

    m = len(coords)
    if m == 0:
        return np.full(0, -1, np.int64), 0
    uf = _UnionFind(m)
    tree = cKDTree(coords)
    for i, j in tree.query_pairs(radius):
        if classes[i] == classes[j]:
            uf.union(i, j)
    roots = np.array([uf.find(i) for i in range(m)])
    ids = np.full(m, -1, np.int64)
    next_id = 0
    for root in np.unique(roots):
        members = np.where(roots == root)[0]
        if len(members) >= min_points:
            ids[members] = next_id
            next_id += 1
    return ids, next_id


def cluster_proposals(
    coords: np.ndarray,
    shifted_coords: np.ndarray,
    classes: np.ndarray,
    valid: np.ndarray,
    radius: float = 0.03,
    min_points: int = 50,
    dual_set: bool = True,
) -> List[np.ndarray]:
    """PointGroup dual-set clustering: proposals from both the original and the
    bias-shifted coordinates (reference clusters both sets and concatenates).

    Returns a list of boolean masks over the full point set.
    """
    idx = np.where(valid)[0]
    proposals: List[np.ndarray] = []
    sets = [shifted_coords[idx]] + ([coords[idx]] if dual_set else [])
    for pts in sets:
        ids, n = bfs_cluster(pts, classes[idx], radius=radius, min_points=min_points)
        for k in range(n):
            mask = np.zeros(len(coords), bool)
            mask[idx[ids == k]] = True
            proposals.append(mask)
    return proposals
