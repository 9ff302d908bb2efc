// Native binned-SAH BVH builder.
//
// C++ replacement for the host-side hot loop the reference delegates to
// lsg::bvh::SplitBVHBuilder / BVHBuilder (src/PTSceneConverter.cpp:97-98,
// 133-135) — the one component SURVEY.md flags as needing native
// performance (400k-triangle scenes).  Emits exactly the schema of the
// numpy builder in logipathtracer_tpu/scene/bvh.py: 2-wide nodes
// {min, max, is_leaf, a, b} with depth-first child order, leaves holding
// at most leaf_size primitives as [first, last) ranges over the
// reordered primitive array.
//
// C ABI (ctypes; see logipathtracer_tpu/scene/bvh_native.py):
//   lpt_build_bvh(aabb_min[n*3], aabb_max[n*3], n, leaf_size, bins,
//                 nodes_min[cap*3], nodes_max[cap*3], nodes_meta[cap*3],
//                 prim_order[n], &num_nodes, &max_depth)  -> 0 on success
// where cap = 2*n (callers allocate; the tree never exceeds 2n-1 nodes).

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Box {
  Vec3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
  Vec3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(const Vec3& a, const Vec3& b) {
    lo = vmin(lo, a);
    hi = vmax(hi, b);
  }
  void grow(const Box& o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  double area() const {
    double dx = std::max(0.0f, hi.x - lo.x);
    double dy = std::max(0.0f, hi.y - lo.y);
    double dz = std::max(0.0f, hi.z - lo.z);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct Builder {
  const Vec3* amin;
  const Vec3* amax;
  std::vector<Vec3> centroid;
  int leaf_size, bins;

  float* nodes_min;
  float* nodes_max;
  int32_t* nodes_meta;
  int32_t* prim_order;
  int num_nodes = 0;
  int order_cursor = 0;
  int max_depth = 0;

  int alloc_node(const int32_t* ids, int count) {
    int slot = num_nodes++;
    Box b;
    for (int i = 0; i < count; i++) b.grow(amin[ids[i]], amax[ids[i]]);
    std::memcpy(nodes_min + 3 * slot, &b.lo, 12);
    std::memcpy(nodes_max + 3 * slot, &b.hi, 12);
    return slot;
  }

  // Partition ids in place; returns split point or -1 (make leaf /
  // median fallback handled by caller).
  int find_split(int32_t* ids, int count) {
    Vec3 cmin{FLT_MAX, FLT_MAX, FLT_MAX};
    Vec3 cmax{-FLT_MAX, -FLT_MAX, -FLT_MAX};
    for (int i = 0; i < count; i++) {
      cmin = vmin(cmin, centroid[ids[i]]);
      cmax = vmax(cmax, centroid[ids[i]]);
    }
    double best_cost = DBL_MAX;
    int best_axis = -1, best_bin = -1;
    for (int axis = 0; axis < 3; axis++) {
      float ext = (&cmax.x)[axis] - (&cmin.x)[axis];
      if (ext <= 0) continue;
      float scale = bins * (1.0f - 1e-6f) / ext;
      std::vector<int> cnt(bins, 0);
      std::vector<Box> bb(bins);
      for (int i = 0; i < count; i++) {
        int b = std::min(
            int(((&centroid[ids[i]].x)[axis] - (&cmin.x)[axis]) * scale),
            bins - 1);
        cnt[b]++;
        bb[b].grow(amin[ids[i]], amax[ids[i]]);
      }
      std::vector<double> rarea(bins);
      Box acc;
      std::vector<int> rcnt(bins);
      int rc = 0;
      for (int b = bins - 1; b > 0; b--) {
        acc.grow(bb[b]);
        rc += cnt[b];
        rarea[b] = acc.area();
        rcnt[b] = rc;
      }
      Box lacc;
      int lc = 0;
      for (int b = 0; b < bins - 1; b++) {
        lacc.grow(bb[b]);
        lc += cnt[b];
        if (lc == 0 || rcnt[b + 1] == 0) continue;
        double cost = lacc.area() * lc + rarea[b + 1] * rcnt[b + 1];
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = axis;
          best_bin = b;
        }
      }
    }
    if (best_axis < 0) return -1;
    float ext = 0, base = 0;
    {
      Vec3 cmin2{FLT_MAX, FLT_MAX, FLT_MAX}, cmax2{-FLT_MAX, -FLT_MAX, -FLT_MAX};
      for (int i = 0; i < count; i++) {
        cmin2 = vmin(cmin2, centroid[ids[i]]);
        cmax2 = vmax(cmax2, centroid[ids[i]]);
      }
      ext = (&cmax2.x)[best_axis] - (&cmin2.x)[best_axis];
      base = (&cmin2.x)[best_axis];
    }
    float scale = bins * (1.0f - 1e-6f) / ext;
    int32_t* mid = std::partition(ids, ids + count, [&](int32_t id) {
      int b = std::min(int(((&centroid[id].x)[best_axis] - base) * scale),
                       bins - 1);
      return b <= best_bin;
    });
    int k = int(mid - ids);
    if (k == 0 || k == count) return -1;
    return k;
  }

  struct Task {
    int32_t* ids;
    int count;
    int slot;
    int depth;
  };

  void build(int32_t* ids, int count, int slot) {
    // Explicit stack: SAH splits can be arbitrarily lopsided, so native
    // recursion depth is unbounded for adversarial input.
    std::vector<Task> stack;
    stack.push_back({ids, count, slot, 0});
    while (!stack.empty()) {
      Task t = stack.back();
      stack.pop_back();
      if (t.depth > max_depth) max_depth = t.depth;
      int k = -1;
      if (t.count > leaf_size) {
        k = find_split(t.ids, t.count);
        if (k < 0) k = t.count / 2;  // degenerate centroids: median index
      }
      if (k < 0) {
        int first = order_cursor;
        std::memcpy(prim_order + first, t.ids, t.count * sizeof(int32_t));
        order_cursor += t.count;
        nodes_meta[3 * t.slot] = 1;
        nodes_meta[3 * t.slot + 1] = first;
        nodes_meta[3 * t.slot + 2] = order_cursor;
        continue;
      }
      int lslot = alloc_node(t.ids, k);
      int rslot = alloc_node(t.ids + k, t.count - k);
      nodes_meta[3 * t.slot] = 0;
      nodes_meta[3 * t.slot + 1] = lslot;
      nodes_meta[3 * t.slot + 2] = rslot;
      // Left processed first (pushed last): leaves stay in DFS
      // left-to-right order, keeping subtree triangle ranges contiguous
      // (scene/clusters.py relies on this).
      stack.push_back({t.ids + k, t.count - k, rslot, t.depth + 1});
      stack.push_back({t.ids, k, lslot, t.depth + 1});
    }
  }
};

}  // namespace

extern "C" {

int lpt_build_bvh(const float* aabb_min, const float* aabb_max, int n,
                  int leaf_size, int bins, float* nodes_min,
                  float* nodes_max, int32_t* nodes_meta,
                  int32_t* prim_order, int32_t* out_num_nodes,
                  int32_t* out_max_depth) {
  if (n <= 0 || leaf_size < 1 || bins < 2) return 1;
  Builder b;
  b.amin = reinterpret_cast<const Vec3*>(aabb_min);
  b.amax = reinterpret_cast<const Vec3*>(aabb_max);
  b.centroid.resize(n);
  for (int i = 0; i < n; i++) {
    b.centroid[i] = {0.5f * (b.amin[i].x + b.amax[i].x),
                     0.5f * (b.amin[i].y + b.amax[i].y),
                     0.5f * (b.amin[i].z + b.amax[i].z)};
  }
  b.leaf_size = leaf_size;
  b.bins = bins;
  b.nodes_min = nodes_min;
  b.nodes_max = nodes_max;
  b.nodes_meta = nodes_meta;
  b.prim_order = prim_order;

  std::vector<int32_t> ids(n);
  for (int i = 0; i < n; i++) ids[i] = i;
  int root = b.alloc_node(ids.data(), n);
  b.build(ids.data(), n, root);
  *out_num_nodes = b.num_nodes;
  *out_max_depth = b.max_depth;
  return 0;
}

// Convenience entry for triangle soups: computes per-triangle AABBs
// then builds (tri_pos: [n][3][3] floats).
int lpt_build_triangle_bvh(const float* tri_pos, int n, int leaf_size,
                           int bins, float* nodes_min, float* nodes_max,
                           int32_t* nodes_meta, int32_t* prim_order,
                           int32_t* out_num_nodes, int32_t* out_max_depth) {
  std::vector<float> amin(3 * size_t(n)), amax(3 * size_t(n));
  for (size_t i = 0; i < size_t(n); i++) {
    const float* t = tri_pos + 9 * i;
    for (int k = 0; k < 3; k++) {
      float v = t[k];
      float lo = std::min(v, std::min(t[3 + k], t[6 + k]));
      float hi = std::max(v, std::max(t[3 + k], t[6 + k]));
      amin[3 * i + k] = lo;
      amax[3 * i + k] = hi;
    }
  }
  return lpt_build_bvh(amin.data(), amax.data(), n, leaf_size, bins,
                       nodes_min, nodes_max, nodes_meta, prim_order,
                       out_num_nodes, out_max_depth);
}

}  // extern "C"
