// Native binned-SAH BVH builder.
//
// TPU-native equivalent of the reference's host-side Rust builder
// (ref: src/component/bvh.rs:246-415): 32 centroid buckets on the
// max-extent axis, prefix/suffix surface-area accumulation, traversal
// cost 0.125, leaf fallback at <= max_leaf primitives, depth-first
// layout with first child at i+1 and the second-child index stored on
// interior nodes (bvh.rs:137-146,219-243).
//
// The algorithm is intentionally IDENTICAL to the NumPy fallback in
// accel/bvh.py (same tie-breaks, same stable partition) so the two
// builders produce bit-identical node arrays and either can validate
// the other.  The scene build is host-side work on the critical path
// of every render start; this runs ~50-100x faster than the Python
// recursion on large meshes.
//
// C ABI only (loaded via ctypes; no pybind11 in the image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kBuckets = 32;
constexpr float kTraversalCost = 0.125f;

struct Vec3 {
  float x, y, z;
  float operator[](int a) const { return a == 0 ? x : (a == 1 ? y : z); }
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

inline float surface_area(const Vec3& mn, const Vec3& mx) {
  float dx = std::max(mx.x - mn.x, 0.0f);
  float dy = std::max(mx.y - mn.y, 0.0f);
  float dz = std::max(mx.z - mn.z, 0.0f);
  return 2.0f * (dx * dy + dy * dz + dz * dx);
}

struct Node {
  Vec3 bmin, bmax;
  int32_t second, start, count, axis;
};

struct Builder {
  const Vec3* pmin;
  const Vec3* pmax;
  const Vec3* centroid;
  int32_t* order;
  int max_leaf;
  std::vector<Node> nodes;
  std::vector<int32_t> scratch;

  void leaf(int lo, int hi) {
    Vec3 mn = pmin[order[lo]], mx = pmax[order[lo]];
    for (int i = lo + 1; i < hi; ++i) {
      mn = vmin(mn, pmin[order[i]]);
      mx = vmax(mx, pmax[order[i]]);
    }
    nodes.push_back({mn, mx, 0, lo, hi - lo, 0});
  }

  int interior_then(int node_id, const Vec3& bmin, const Vec3& bmax,
                    int axis, int lo, int mid, int hi) {
    nodes.push_back({bmin, bmax, 0, 0, 0, axis});
    recurse(lo, mid);
    int second_id = recurse(mid, hi);
    nodes[node_id].second = second_id;
    return node_id;
  }

  int recurse(int lo, int hi) {
    int node_id = static_cast<int>(nodes.size());
    int n = hi - lo;
    Vec3 bmin = pmin[order[lo]], bmax = pmax[order[lo]];
    for (int i = lo + 1; i < hi; ++i) {
      bmin = vmin(bmin, pmin[order[i]]);
      bmax = vmax(bmax, pmax[order[i]]);
    }
    if (n <= max_leaf) {
      leaf(lo, hi);
      return node_id;
    }
    Vec3 cmin = centroid[order[lo]], cmax = centroid[order[lo]];
    for (int i = lo + 1; i < hi; ++i) {
      cmin = vmin(cmin, centroid[order[i]]);
      cmax = vmax(cmax, centroid[order[i]]);
    }
    Vec3 extent = {cmax.x - cmin.x, cmax.y - cmin.y, cmax.z - cmin.z};
    // argmax with first-max tie-break, matching np.argmax
    int axis = 0;
    if (extent.y > extent[axis]) axis = 1;
    if (extent.z > extent[axis]) axis = 2;
    if (extent[axis] < 1e-12f)
      return interior_then(node_id, bmin, bmax, axis, lo, (lo + hi) / 2, hi);

    float scale = static_cast<float>(kBuckets) / extent[axis];
    int32_t counts[kBuckets] = {0};
    Vec3 bucket_min[kBuckets], bucket_max[kBuckets];
    const float inf = std::numeric_limits<float>::infinity();
    for (int k = 0; k < kBuckets; ++k) {
      bucket_min[k] = {inf, inf, inf};
      bucket_max[k] = {-inf, -inf, -inf};
    }
    std::vector<int8_t> bucket_of(n);
    for (int i = 0; i < n; ++i) {
      int32_t id = order[lo + i];
      // match NumPy: int64 truncation of (c - cmin) * scale, clipped
      int64_t b = static_cast<int64_t>(
          (centroid[id][axis] - cmin[axis]) * scale);
      if (b > kBuckets - 1) b = kBuckets - 1;
      if (b < 0) b = 0;
      bucket_of[i] = static_cast<int8_t>(b);
      counts[b]++;
      bucket_min[b] = vmin(bucket_min[b], pmin[id]);
      bucket_max[b] = vmax(bucket_max[b], pmax[id]);
    }
    Vec3 left_min[kBuckets], left_max[kBuckets];
    Vec3 right_min[kBuckets], right_max[kBuckets];
    int64_t left_count[kBuckets], right_count[kBuckets];
    left_min[0] = bucket_min[0];
    left_max[0] = bucket_max[0];
    left_count[0] = counts[0];
    for (int k = 1; k < kBuckets; ++k) {
      left_min[k] = vmin(left_min[k - 1], bucket_min[k]);
      left_max[k] = vmax(left_max[k - 1], bucket_max[k]);
      left_count[k] = left_count[k - 1] + counts[k];
    }
    right_min[kBuckets - 1] = bucket_min[kBuckets - 1];
    right_max[kBuckets - 1] = bucket_max[kBuckets - 1];
    right_count[kBuckets - 1] = counts[kBuckets - 1];
    for (int k = kBuckets - 2; k >= 0; --k) {
      right_min[k] = vmin(right_min[k + 1], bucket_min[k]);
      right_max[k] = vmax(right_max[k + 1], bucket_max[k]);
      right_count[k] = right_count[k + 1] + counts[k];
    }
    float total_area = std::max(surface_area(bmin, bmax), 1e-20f);
    float best_cost = inf;
    int best = 0;  // argmin over all-inf costs -> 0, matching np.argmin
    for (int k = 0; k < kBuckets - 1; ++k) {
      if (left_count[k] == 0 || right_count[k + 1] == 0) continue;
      float cost = kTraversalCost +
                   (left_count[k] * surface_area(left_min[k], left_max[k]) +
                    right_count[k + 1] *
                        surface_area(right_min[k + 1], right_max[k + 1])) /
                       total_area;
      if (cost < best_cost) {
        best_cost = cost;
        best = k;
      }
    }
    if (!std::isfinite(best_cost))
      return interior_then(node_id, bmin, bmax, axis, lo, (lo + hi) / 2, hi);

    // stable partition by bucket <= best (matches the NumPy fancy-index
    // partition, which preserves relative order on both sides)
    scratch.resize(n);
    int nl = 0, nr = 0;
    for (int i = 0; i < n; ++i)
      if (bucket_of[i] <= best) order[lo + nl++] = order[lo + i];
      else scratch[nr++] = order[lo + i];
    std::memcpy(order + lo + nl, scratch.data(), nr * sizeof(int32_t));
    return interior_then(node_id, bmin, bmax, axis, lo, lo + nl, hi);
  }
};

Builder* g_last = nullptr;

}  // namespace

extern "C" {

// Phase 1: build.  Returns the node count (call arendur_bvh_export next
// with arrays of that size), or -1 on error.  Not thread-safe (the CLI
// and scene loader call it from one thread, like the reference's
// single-threaded BVH::new).
int32_t arendur_bvh_build(const float* v0, const float* v1, const float* v2,
                          int32_t n_tris, int32_t max_leaf, int32_t* order) {
  if (n_tris <= 0 || max_leaf < 1) return -1;
  delete g_last;
  g_last = nullptr;
  auto* b = new Builder();
  static thread_local std::vector<Vec3> pmin_s, pmax_s, cent_s;
  pmin_s.resize(n_tris);
  pmax_s.resize(n_tris);
  cent_s.resize(n_tris);
  for (int i = 0; i < n_tris; ++i) {
    Vec3 a = {v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]};
    Vec3 c = {v1[3 * i], v1[3 * i + 1], v1[3 * i + 2]};
    Vec3 d = {v2[3 * i], v2[3 * i + 1], v2[3 * i + 2]};
    pmin_s[i] = vmin(vmin(a, c), d);
    pmax_s[i] = vmax(vmax(a, c), d);
    cent_s[i] = {0.5f * (pmin_s[i].x + pmax_s[i].x),
                 0.5f * (pmin_s[i].y + pmax_s[i].y),
                 0.5f * (pmin_s[i].z + pmax_s[i].z)};
    order[i] = i;
  }
  b->pmin = pmin_s.data();
  b->pmax = pmax_s.data();
  b->centroid = cent_s.data();
  b->order = order;
  b->max_leaf = max_leaf;
  b->nodes.reserve(2 * n_tris);
  b->recurse(0, n_tris);
  g_last = b;
  return static_cast<int32_t>(b->nodes.size());
}

// Phase 2: export the node SoA from the last build.
int32_t arendur_bvh_export(float* bmin, float* bmax, int32_t* second,
                           int32_t* start, int32_t* count, int32_t* axis) {
  if (!g_last) return -1;
  const auto& nodes = g_last->nodes;
  for (size_t i = 0; i < nodes.size(); ++i) {
    bmin[3 * i] = nodes[i].bmin.x;
    bmin[3 * i + 1] = nodes[i].bmin.y;
    bmin[3 * i + 2] = nodes[i].bmin.z;
    bmax[3 * i] = nodes[i].bmax.x;
    bmax[3 * i + 1] = nodes[i].bmax.y;
    bmax[3 * i + 2] = nodes[i].bmax.z;
    second[i] = nodes[i].second;
    start[i] = nodes[i].start;
    count[i] = nodes[i].count;
    axis[i] = nodes[i].axis;
  }
  delete g_last;
  g_last = nullptr;
  return 0;
}

}  // extern "C"
