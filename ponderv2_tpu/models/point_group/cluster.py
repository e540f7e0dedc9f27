"""Instance clustering: radius-graph BFS components (host-side).

Reference: the pointgroup_ops CUDA ballquery + C++ BFS
(/root/reference/libs/pointgroup_ops/src/bfs_cluster.cpp:40-145, used at
ponder/models/point_group/point_group_v1m1_base.py:119-131). Clustering is
inference-only postprocessing, so it stays off the device hot path. Protocol
is EXACT to the reference: per-point neighbor lists are in-radius (strict
``d2 < r2``), in ascending index order, truncated at the kernel's hard cap of
1000 (bfs_cluster_kernel.cu ``idx_temp[1000]``); components grow by BFS
through neighbors sharing the current point's semantic label, seeded in
ascending index order; small components are discarded but stay visited.
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
    cpp_path = os.path.abspath(os.path.join(csrc, "cluster.cpp"))
    stale = os.path.isfile(so_path) and os.path.isfile(cpp_path) and (
        os.path.getmtime(so_path) < os.path.getmtime(cpp_path)
    )
    if not os.path.isfile(so_path) or stale:
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


NEIGHBOR_CAP = 1000  # reference kernel idx_temp[1000]


def bfs_cluster(
    coords: np.ndarray,
    classes: np.ndarray,
    radius: float = 0.03,
    min_points: int = 50,
) -> Tuple[np.ndarray, int]:
    """Cluster ``coords`` (M, 3) with per-point ``classes`` (M,) into instances.

    Returns (instance_ids (M,), num_instances); unclustered points get -1.
    Cluster ids are assigned in BFS seed order (ascending first-member index),
    matching the reference's cluster enumeration. Uses the native C++ grid-hash
    BFS when available (built from ponderv2_tpu/csrc/cluster.cpp); the numpy
    fallback below implements the identical protocol.
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

    tree = cKDTree(coords)
    # index-ordered, capped neighbor lists; strict < via tiny radius shrink is
    # wrong for exactness — filter strictly instead
    raw = tree.query_ball_point(coords, radius)
    nbr = []
    for i, cand in enumerate(raw):
        cand = np.sort(np.asarray(cand, np.int64))
        d2 = np.sum((coords[cand] - coords[i]) ** 2, axis=1)
        cand = cand[d2 < radius * radius]
        nbr.append(cand[:NEIGHBOR_CAP])

    visited = np.zeros(m, bool)
    ids = np.full(m, -1, np.int64)
    next_id = 0
    for seed in range(m):
        if visited[seed]:
            continue
        members = [seed]
        visited[seed] = True
        queue = [seed]
        head = 0
        while head < len(queue):
            cur = queue[head]
            head += 1
            for j in nbr[cur]:
                if visited[j] or classes[j] != classes[cur]:
                    continue
                visited[j] = True
                members.append(j)
                queue.append(j)
        if len(members) >= min_points:
            ids[np.asarray(members)] = next_id
            next_id += 1
    return ids, next_id


def cluster_proposals(
    coords: np.ndarray,
    shifted_coords: np.ndarray,
    classes: np.ndarray,
    valid: np.ndarray,
    radius: float = 0.03,
    min_points: int = 50,
    dual_set: bool = False,
) -> List[np.ndarray]:
    """PointGroup proposal clustering over the bias-shifted coordinates
    (reference clusters ONLY ``center_pred``, point_group_v1m1_base.py:92-131).
    ``dual_set=True`` additionally clusters the original coordinates and
    concatenates both proposal sets — an extension beyond the reference
    protocol, off by default.

    Returns a list of boolean masks over the full point set, in cluster order.
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
