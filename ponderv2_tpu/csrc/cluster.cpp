// Radius-graph connected-component clustering (PointGroup proposal generation).
//
// Native equivalent of the reference's pointgroup_ops CUDA ballquery + C++ BFS
// (/root/reference/libs/pointgroup_ops/src/bfs_cluster.cpp:40-145): two points
// connect iff within `radius` AND sharing a semantic class. Uses a uniform grid
// hash (cell = radius) + union-find with path compression; O(n * 27 * k).
//
// Build: ponderv2_tpu/csrc/build.sh  ->  libponder_cluster.so (ctypes ABI).

#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(int32_t n) : parent(n) {
    for (int32_t i = 0; i < n; ++i) parent[i] = i;
  }
  int32_t find(int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int32_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }
  void unite(int32_t a, int32_t b) {
    int32_t ra = find(a), rb = find(b);
    if (ra != rb) parent[rb] = ra;
  }
};

inline int64_t cell_key(int64_t cx, int64_t cy, int64_t cz) {
  // large-prime mix; exactness not required (collisions only add candidates)
  return cx * 73856093LL ^ cy * 19349663LL ^ cz * 83492791LL;
}

}  // namespace

extern "C" {

// coords: (n, 3) float32; classes: (n,) int32; out_ids: (n,) int32 (-1 = noise).
// Returns the number of clusters with >= min_points members.
int32_t ponder_bfs_cluster(const float* coords, const int32_t* classes,
                           int32_t n, float radius, int32_t min_points,
                           int32_t* out_ids) {
  if (n <= 0) return 0;
  const float r2 = radius * radius;
  const float inv_cell = 1.0f / radius;

  std::unordered_map<int64_t, std::vector<int32_t>> grid;
  grid.reserve(static_cast<size_t>(n) * 2);
  std::vector<int64_t> cx(n), cy(n), cz(n);
  for (int32_t i = 0; i < n; ++i) {
    cx[i] = static_cast<int64_t>(std::floor(coords[3 * i + 0] * inv_cell));
    cy[i] = static_cast<int64_t>(std::floor(coords[3 * i + 1] * inv_cell));
    cz[i] = static_cast<int64_t>(std::floor(coords[3 * i + 2] * inv_cell));
    grid[cell_key(cx[i], cy[i], cz[i])].push_back(i);
  }

  UnionFind uf(n);
  for (int32_t i = 0; i < n; ++i) {
    const float xi = coords[3 * i], yi = coords[3 * i + 1], zi = coords[3 * i + 2];
    const int32_t ci = classes[i];
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy)
        for (int64_t dz = -1; dz <= 1; ++dz) {
          auto it = grid.find(cell_key(cx[i] + dx, cy[i] + dy, cz[i] + dz));
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            if (j <= i || classes[j] != ci) continue;
            const float ddx = coords[3 * j] - xi;
            const float ddy = coords[3 * j + 1] - yi;
            const float ddz = coords[3 * j + 2] - zi;
            if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) uf.unite(i, j);
          }
        }
  }

  // densify component ids, filter small components
  std::unordered_map<int32_t, int32_t> count;
  for (int32_t i = 0; i < n; ++i) count[uf.find(i)]++;
  std::unordered_map<int32_t, int32_t> remap;
  int32_t next_id = 0;
  for (int32_t i = 0; i < n; ++i) {
    const int32_t root = uf.find(i);
    if (count[root] >= min_points) {
      auto it = remap.find(root);
      if (it == remap.end()) it = remap.emplace(root, next_id++).first;
      out_ids[i] = it->second;
    } else {
      out_ids[i] = -1;
    }
  }
  return next_id;
}

// Fixed-radius neighbor query with CSR output sizing pass
// (native analog of pointgroup_ops ballquery_batch_p, functions.py:6-44).
// Writes up to max_neighbors per query into out_idx; out_cnt gets true counts.
void ponder_ball_query(const float* coords, int32_t n, const float* queries,
                       int32_t m, float radius, int32_t max_neighbors,
                       int32_t* out_idx, int32_t* out_cnt) {
  const float r2 = radius * radius;
  const float inv_cell = 1.0f / radius;
  std::unordered_map<int64_t, std::vector<int32_t>> grid;
  grid.reserve(static_cast<size_t>(n) * 2);
  for (int32_t i = 0; i < n; ++i) {
    const int64_t gx = static_cast<int64_t>(std::floor(coords[3 * i] * inv_cell));
    const int64_t gy = static_cast<int64_t>(std::floor(coords[3 * i + 1] * inv_cell));
    const int64_t gz = static_cast<int64_t>(std::floor(coords[3 * i + 2] * inv_cell));
    grid[cell_key(gx, gy, gz)].push_back(i);
  }
  for (int32_t q = 0; q < m; ++q) {
    const float xq = queries[3 * q], yq = queries[3 * q + 1], zq = queries[3 * q + 2];
    const int64_t gx = static_cast<int64_t>(std::floor(xq * inv_cell));
    const int64_t gy = static_cast<int64_t>(std::floor(yq * inv_cell));
    const int64_t gz = static_cast<int64_t>(std::floor(zq * inv_cell));
    int32_t cnt = 0;
    for (int64_t dx = -1; dx <= 1 && cnt < max_neighbors; ++dx)
      for (int64_t dy = -1; dy <= 1 && cnt < max_neighbors; ++dy)
        for (int64_t dz = -1; dz <= 1 && cnt < max_neighbors; ++dz) {
          auto it = grid.find(cell_key(gx + dx, gy + dy, gz + dz));
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            const float ddx = coords[3 * j] - xq;
            const float ddy = coords[3 * j + 1] - yq;
            const float ddz = coords[3 * j + 2] - zq;
            if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) {
              if (cnt < max_neighbors) out_idx[q * max_neighbors + cnt] = j;
              ++cnt;
            }
          }
        }
    out_cnt[q] = cnt;
  }
}

}  // extern "C"
