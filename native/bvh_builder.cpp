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

// ---------------------------------------------------------------------
// SBVH: binned SAH with spatial splits (Stich et al. 2009), the quality
// the reference gets from lsg::bvh::SplitBVHBuilder<float>
// (src/PTSceneConverter.cpp:97-98).  References may be split at bin
// planes — the triangle is clipped to each side, so both children get a
// TIGHT fragment AABB — and the leaf order then contains duplicate
// triangle ids (the emitted soup materializes the duplicates; all
// downstream invariants — DFS-contiguous subtree ranges, [first,last)
// leaves — are preserved).

struct SRef {
  int32_t id;
  Box box;
};

struct SBuilder {
  const float* tri_pos;  // [n][9]
  int leaf_size, bins;
  double min_overlap;    // spatial split gate: overlap area / root area
  int extra_budget;      // max additional references (duplication cap)

  float* nodes_min;
  float* nodes_max;
  int32_t* nodes_meta;
  int32_t* prim_order;
  int num_nodes = 0;
  int order_cursor = 0;
  int max_depth = 0;
  double root_area = 1.0;

  int alloc_node(const std::vector<SRef>& refs) {
    int slot = num_nodes++;
    Box b;
    for (const SRef& r : refs) b.grow(r.box);
    std::memcpy(nodes_min + 3 * slot, &b.lo, 12);
    std::memcpy(nodes_max + 3 * slot, &b.hi, 12);
    return slot;
  }

  static Box node_box(const std::vector<SRef>& refs) {
    Box b;
    for (const SRef& r : refs) b.grow(r.box);
    return b;
  }

  // Tight AABB of (triangle id ∩ slab lo..hi on axis) ∩ ref box:
  // Sutherland-Hodgman clip of the 3-gon against the two slab planes.
  Box clip_ref(const SRef& ref, int axis, float lo, float hi) const {
    const float* t = tri_pos + 9 * size_t(ref.id);
    float poly[16][3], tmp[16][3];
    int np = 3;
    for (int v = 0; v < 3; v++)
      for (int k = 0; k < 3; k++) poly[v][k] = t[3 * v + k];
    // clip against axis >= lo then axis <= hi
    for (int pass = 0; pass < 2; pass++) {
      float plane = pass == 0 ? lo : hi;
      float sign = pass == 0 ? 1.0f : -1.0f;
      int nout = 0;
      for (int v = 0; v < np; v++) {
        const float* a = poly[v];
        const float* b = poly[(v + 1) % np];
        float da = sign * (a[axis] - plane);
        float db = sign * (b[axis] - plane);
        if (da >= 0) {
          for (int k = 0; k < 3; k++) tmp[nout][k] = a[k];
          nout++;
        }
        if ((da >= 0) != (db >= 0)) {
          float w = da / (da - db);
          for (int k = 0; k < 3; k++)
            tmp[nout][k] = a[k] + w * (b[k] - a[k]);
          nout++;
        }
      }
      np = nout;
      std::memcpy(poly, tmp, sizeof(float) * 3 * size_t(np));
      if (np == 0) break;
    }
    Box out;
    for (int v = 0; v < np; v++) {
      Vec3 p{poly[v][0], poly[v][1], poly[v][2]};
      out.grow(p, p);
    }
    // Stay inside the (possibly already clipped) parent reference box.
    if (np > 0) {
      out.lo = vmax(out.lo, ref.box.lo);
      out.hi = vmin(out.hi, ref.box.hi);
    } else {
      // Degenerate (triangle only touches the slab): fall back to the
      // box intersection so the fragment stays valid.
      out = ref.box;
      (&out.lo.x)[axis] = std::max((&out.lo.x)[axis], lo);
      (&out.hi.x)[axis] = std::min((&out.hi.x)[axis], hi);
    }
    return out;
  }

  struct ObjSplit {
    double cost = DBL_MAX;
    int axis = -1, bin = -1;
    Vec3 cmin, cmax;
  };

  ObjSplit find_object_split(const std::vector<SRef>& refs) const {
    ObjSplit s;
    Vec3 cmin{FLT_MAX, FLT_MAX, FLT_MAX};
    Vec3 cmax{-FLT_MAX, -FLT_MAX, -FLT_MAX};
    for (const SRef& r : refs) {
      Vec3 c{0.5f * (r.box.lo.x + r.box.hi.x),
             0.5f * (r.box.lo.y + r.box.hi.y),
             0.5f * (r.box.lo.z + r.box.hi.z)};
      cmin = vmin(cmin, c);
      cmax = vmax(cmax, c);
    }
    s.cmin = cmin;
    s.cmax = cmax;
    for (int axis = 0; axis < 3; axis++) {
      float ext = (&cmax.x)[axis] - (&cmin.x)[axis];
      if (ext <= 0) continue;
      float scale = bins * (1.0f - 1e-6f) / ext;
      std::vector<int> cnt(bins, 0);
      std::vector<Box> bb(bins);
      for (const SRef& r : refs) {
        float c = 0.5f * ((&r.box.lo.x)[axis] + (&r.box.hi.x)[axis]);
        int b = std::min(int((c - (&cmin.x)[axis]) * scale), bins - 1);
        cnt[b]++;
        bb[b].grow(r.box);
      }
      std::vector<double> rarea(bins);
      std::vector<int> rcnt(bins);
      Box acc;
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
        if (cost < s.cost) {
          s.cost = cost;
          s.axis = axis;
          s.bin = b;
        }
      }
    }
    return s;
  }

  struct SpatialSplit {
    double cost = DBL_MAX;
    int axis = -1;
    float pos = 0;
  };

  SpatialSplit find_spatial_split(const std::vector<SRef>& refs,
                                  const Box& nb) const {
    SpatialSplit s;
    for (int axis = 0; axis < 3; axis++) {
      float lo = (&nb.lo.x)[axis], hi = (&nb.hi.x)[axis];
      float ext = hi - lo;
      if (ext <= 0) continue;
      float scale = bins * (1.0f - 1e-6f) / ext;
      float width = ext / bins;
      std::vector<int> entry(bins, 0), exit_(bins, 0);
      std::vector<Box> bb(bins);
      for (const SRef& r : refs) {
        int b0 = std::min(int(((&r.box.lo.x)[axis] - lo) * scale), bins - 1);
        int b1 = std::min(int(((&r.box.hi.x)[axis] - lo) * scale), bins - 1);
        b0 = std::max(b0, 0);
        b1 = std::max(b1, b0);
        entry[b0]++;
        exit_[b1]++;
        if (b0 == b1) {
          bb[b0].grow(r.box);
        } else {
          for (int b = b0; b <= b1; b++)
            bb[b].grow(clip_ref(r, axis, lo + b * width,
                                b + 1 == bins ? hi : lo + (b + 1) * width));
        }
      }
      std::vector<double> rarea(bins);
      std::vector<int> rcnt(bins);
      Box acc;
      int rc = 0;
      for (int b = bins - 1; b > 0; b--) {
        acc.grow(bb[b]);
        rc += exit_[b];
        rarea[b] = acc.area();
        rcnt[b] = rc;
      }
      Box lacc;
      int lc = 0;
      for (int b = 0; b < bins - 1; b++) {
        lacc.grow(bb[b]);
        lc += entry[b];
        if (lc == 0 || rcnt[b + 1] == 0) continue;
        double cost = lacc.area() * lc + rarea[b + 1] * rcnt[b + 1];
        if (cost < s.cost) {
          s.cost = cost;
          s.axis = axis;
          s.pos = lo + (b + 1) * width;
        }
      }
    }
    return s;
  }

  struct Task {
    std::vector<SRef> refs;
    int slot;
    int depth;
  };

  void build(std::vector<SRef> root_refs, int slot) {
    std::vector<Task> stack;
    stack.push_back({std::move(root_refs), slot, 0});
    while (!stack.empty()) {
      Task t = std::move(stack.back());
      stack.pop_back();
      if (t.depth > max_depth) max_depth = t.depth;
      int count = int(t.refs.size());
      bool split_ok = false;
      std::vector<SRef> left, right;

      // Depth guard: duplication-heavy regions could otherwise split
      // geometrically (not by count) past any useful depth.
      if (count > leaf_size && t.depth < 96) {
        Box nb = node_box(t.refs);
        ObjSplit os = find_object_split(t.refs);

        // Spatial split is considered when the object split's children
        // overlap significantly (Stich's alpha test).
        SpatialSplit ss;
        if (os.axis >= 0 && extra_budget > 0) {
          Box lb, rb;
          float ext = (&os.cmax.x)[os.axis] - (&os.cmin.x)[os.axis];
          float scale = bins * (1.0f - 1e-6f) / ext;
          for (const SRef& r : t.refs) {
            float c = 0.5f * ((&r.box.lo.x)[os.axis]
                              + (&r.box.hi.x)[os.axis]);
            int b = std::min(int((c - (&os.cmin.x)[os.axis]) * scale),
                             bins - 1);
            (b <= os.bin ? lb : rb).grow(r.box);
          }
          Box ov;
          ov.lo = vmax(lb.lo, rb.lo);
          ov.hi = vmin(lb.hi, rb.hi);
          bool overlapping = ov.lo.x <= ov.hi.x && ov.lo.y <= ov.hi.y
                             && ov.lo.z <= ov.hi.z;
          if (overlapping && ov.area() > min_overlap * root_area)
            ss = find_spatial_split(t.refs, nb);
        }

        if (ss.axis >= 0 && ss.cost < os.cost) {
          // ---- spatial split: partition + duplicate straddlers ------
          for (const SRef& r : t.refs) {
            float blo = (&r.box.lo.x)[ss.axis];
            float bhi = (&r.box.hi.x)[ss.axis];
            if (bhi <= ss.pos) {
              left.push_back(r);
            } else if (blo >= ss.pos) {
              right.push_back(r);
            } else if (extra_budget > 0) {
              SRef rl = r, rr = r;
              rl.box = clip_ref(r, ss.axis, blo, ss.pos);
              rr.box = clip_ref(r, ss.axis, ss.pos, bhi);
              left.push_back(rl);
              right.push_back(rr);
              extra_budget--;
            } else {
              // Budget exhausted: unsplit to the side with more extent.
              (ss.pos - blo > bhi - ss.pos ? left : right).push_back(r);
            }
          }
          split_ok = !left.empty() && !right.empty();
        }

        if (!split_ok && os.axis >= 0) {
          // ---- object split ------------------------------------------
          left.clear();
          right.clear();
          float ext = (&os.cmax.x)[os.axis] - (&os.cmin.x)[os.axis];
          float scale = bins * (1.0f - 1e-6f) / ext;
          for (const SRef& r : t.refs) {
            float c = 0.5f * ((&r.box.lo.x)[os.axis]
                              + (&r.box.hi.x)[os.axis]);
            int b = std::min(int((c - (&os.cmin.x)[os.axis]) * scale),
                             bins - 1);
            (b <= os.bin ? left : right).push_back(r);
          }
          split_ok = !left.empty() && !right.empty();
        }
        if (!split_ok) {
          // Degenerate centroids: median split keeps the tree bounded.
          left.assign(t.refs.begin(), t.refs.begin() + count / 2);
          right.assign(t.refs.begin() + count / 2, t.refs.end());
          split_ok = !left.empty() && !right.empty();
        }
      }

      if (!split_ok) {
        int first = order_cursor;
        for (const SRef& r : t.refs) prim_order[order_cursor++] = r.id;
        nodes_meta[3 * t.slot] = 1;
        nodes_meta[3 * t.slot + 1] = first;
        nodes_meta[3 * t.slot + 2] = order_cursor;
        continue;
      }

      t.refs.clear();
      t.refs.shrink_to_fit();
      int lslot = alloc_node(left);
      int rslot = alloc_node(right);
      nodes_meta[3 * t.slot] = 0;
      nodes_meta[3 * t.slot + 1] = lslot;
      nodes_meta[3 * t.slot + 2] = rslot;
      // Left pushed last -> processed first: DFS left-to-right leaf
      // order keeps subtree ranges contiguous (scene/clusters.py).
      stack.push_back({std::move(right), rslot, t.depth + 1});
      stack.push_back({std::move(left), lslot, t.depth + 1});
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

// SBVH (spatial splits) for triangle meshes — the quality the reference
// gets from lsg::bvh::SplitBVHBuilder (src/PTSceneConverter.cpp:97-98).
// prim_order must hold max_refs entries (duplication cap; callers pass
// e.g. 2n); node buffers must hold 2*max_refs nodes.  *out_num_refs
// returns the emitted (duplicated) leaf-order length.
int lpt_build_triangle_sbvh(const float* tri_pos, int n, int leaf_size,
                            int bins, float min_overlap, int max_refs,
                            float* nodes_min, float* nodes_max,
                            int32_t* nodes_meta, int32_t* prim_order,
                            int32_t* out_num_nodes, int32_t* out_max_depth,
                            int32_t* out_num_refs) {
  if (n <= 0 || leaf_size < 1 || bins < 2 || max_refs < n) return 1;
  SBuilder b;
  b.tri_pos = tri_pos;
  b.leaf_size = leaf_size;
  b.bins = bins;
  b.min_overlap = min_overlap;
  b.extra_budget = max_refs - n;
  b.nodes_min = nodes_min;
  b.nodes_max = nodes_max;
  b.nodes_meta = nodes_meta;
  b.prim_order = prim_order;

  std::vector<SRef> refs(n);
  for (int i = 0; i < n; i++) {
    refs[i].id = i;
    const float* t = tri_pos + 9 * size_t(i);
    Box box;
    for (int v = 0; v < 3; v++) {
      Vec3 p{t[3 * v], t[3 * v + 1], t[3 * v + 2]};
      box.grow(p, p);
    }
    refs[i].box = box;
  }
  b.root_area = SBuilder::node_box(refs).area();
  int root = b.alloc_node(refs);
  b.build(std::move(refs), root);
  *out_num_nodes = b.num_nodes;
  *out_max_depth = b.max_depth;
  *out_num_refs = b.order_cursor;
  return 0;
}

}  // extern "C"
