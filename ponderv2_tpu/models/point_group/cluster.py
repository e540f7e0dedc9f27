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

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE: Optional[ctypes.CDLL] = None
_NATIVE_TRIED = False


def _load_native() -> Optional[ctypes.CDLL]:
    """Load (building on first use if needed) the C++ clustering library."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    csrc = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
    so_path = os.path.abspath(os.path.join(csrc, "libponder_cluster.so"))
    if not os.path.isfile(so_path):
        try:
            subprocess.run(
                ["bash", os.path.join(os.path.abspath(csrc), "build.sh")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
        lib.ponder_bfs_cluster.restype = ctypes.c_int32
        lib.ponder_bfs_cluster.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _NATIVE = lib
    except OSError:
        _NATIVE = None
    return _NATIVE


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
    Uses the native C++ grid-hash union-find when available (built from
    ponderv2_tpu/csrc/cluster.cpp); falls back to scipy KDTree + python UF.
    """
    m = len(coords)
    if m == 0:
        return np.full(0, -1, np.int64), 0

    lib = _load_native()
    if lib is not None:
        c = np.ascontiguousarray(coords, np.float32)
        cl = np.ascontiguousarray(classes, np.int32)
        out = np.empty(m, np.int32)
        n_clusters = lib.ponder_bfs_cluster(
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int32(m), ctypes.c_float(radius),
            ctypes.c_int32(min_points),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out.astype(np.int64), int(n_clusters)

    from scipy.spatial import cKDTree
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
