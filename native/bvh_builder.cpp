// Host-side binned-SAH BVH builder.
//
// Native-runtime counterpart of light_transport_tpu/accel/bvh.py::_build_host
// (same algorithm, same flat node layout) for large meshes where the numpy
// build dominates scene-setup time.  The reference's "native layer" is
// numba's LLVM JIT plus a Python port of C++ STL algorithms
// (reference src/stl4py.py); this is the real thing.
//
// Exposed via a C ABI for ctypes (no pybind11 in this toolchain).
//
// Node layout (depth-first): left child = node + 1, right child = right[n];
// count[n] > 0 marks a leaf over prims [first[n], first[n]+count[n]) of the
// reordered primitive array described by `order`.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kBuckets = 12;
constexpr double kTraversalCost = 1.0;
constexpr double kIntersectCost = 1.0;

struct V3 {
  double x, y, z;
  double operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
};

inline V3 vmin(const V3& a, const V3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline V3 vmax(const V3& a, const V3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

inline double area(const V3& lo, const V3& hi) {
  double dx = std::max(hi.x - lo.x, 0.0);
  double dy = std::max(hi.y - lo.y, 0.0);
  double dz = std::max(hi.z - lo.z, 0.0);
  return 2.0 * (dx * dy + dy * dz + dz * dx);
}

struct Builder {
  const V3* lo;
  const V3* hi;
  const V3* centroid;
  int max_leaf;
  int64_t* order;

  std::vector<V3> nmin, nmax;
  std::vector<int32_t> nright, nfirst, ncount, naxis;

  int emit() {
    nmin.push_back({0, 0, 0});
    nmax.push_back({0, 0, 0});
    nright.push_back(0);
    nfirst.push_back(0);
    ncount.push_back(0);
    naxis.push_back(0);
    return static_cast<int>(ncount.size()) - 1;
  }

  // Iterative DFS with an explicit work stack: recursion depth is O(tree
  // depth), and adversarially unbalanced SAH splits (each split peeling a
  // handful of prims) can make that O(T) — deep enough to overflow the C
  // stack and segfault the host process.  Tasks carry the node whose
  // `nright` must point at them; pushing right-then-left preserves the
  // recursive version's exact emission order (left child = node + 1).
  struct Task {
    int64_t start, end;
    int32_t fix_right;  // parent node whose nright = this task's node; -1 none
  };

  void build(int64_t root_start, int64_t root_end) {
    std::vector<Task> work;
    work.push_back({root_start, root_end, -1});
    while (!work.empty()) {
      const Task task = work.back();
      work.pop_back();
      build_node(task, work);
    }
  }

  void build_node(const Task& task, std::vector<Task>& work) {
    const int64_t start = task.start, end = task.end;
    const int node = emit();
    if (task.fix_right >= 0) nright[task.fix_right] = node;
    const int64_t n = end - start;
    V3 b_lo = lo[order[start]];
    V3 b_hi = hi[order[start]];
    V3 c_lo = centroid[order[start]];
    V3 c_hi = c_lo;
    for (int64_t i = start + 1; i < end; ++i) {
      b_lo = vmin(b_lo, lo[order[i]]);
      b_hi = vmax(b_hi, hi[order[i]]);
      c_lo = vmin(c_lo, centroid[order[i]]);
      c_hi = vmax(c_hi, centroid[order[i]]);
    }
    nmin[node] = b_lo;
    nmax[node] = b_hi;

    const V3 extent = {c_hi.x - c_lo.x, c_hi.y - c_lo.y, c_hi.z - c_lo.z};
    int ax = 0;
    if (extent.y > extent[ax]) ax = 1;
    if (extent.z > extent[ax]) ax = 2;

    if (n <= max_leaf) {
      nfirst[node] = static_cast<int32_t>(start);
      ncount[node] = static_cast<int32_t>(n);
      return;
    }
    if (extent[ax] <= 1e-12) {
      // degenerate centroid cluster: median-split so no leaf exceeds
      // max_leaf (the traversal unrolls exactly max_leaf prim tests)
      std::nth_element(order + start, order + start + n / 2, order + end,
                       [&](int64_t a, int64_t b2) {
                         return centroid[a][ax] < centroid[b2][ax];
                       });
      const int64_t mid = start + n / 2;
      naxis[node] = ax;
      ncount[node] = 0;
      work.push_back({mid, end, node});
      work.push_back({start, mid, -1});
      return;
    }

    // binned SAH along ax
    int64_t counts[kBuckets] = {0};
    V3 bmin[kBuckets], bmax[kBuckets];
    for (int b = 0; b < kBuckets; ++b) {
      bmin[b] = {std::numeric_limits<double>::infinity(),
                 std::numeric_limits<double>::infinity(),
                 std::numeric_limits<double>::infinity()};
      bmax[b] = {-std::numeric_limits<double>::infinity(),
                 -std::numeric_limits<double>::infinity(),
                 -std::numeric_limits<double>::infinity()};
    }
    const double inv_extent = 1.0 / extent[ax];
    auto bucket_of = [&](int64_t prim) {
      double rel = (centroid[prim][ax] - c_lo[ax]) * inv_extent;
      int b = static_cast<int>(rel * kBuckets);
      return std::min(std::max(b, 0), kBuckets - 1);
    };
    for (int64_t i = start; i < end; ++i) {
      const int b = bucket_of(order[i]);
      ++counts[b];
      bmin[b] = vmin(bmin[b], lo[order[i]]);
      bmax[b] = vmax(bmax[b], hi[order[i]]);
    }

    // prefix/suffix sweep
    double larea[kBuckets], rarea[kBuckets];
    int64_t lcount[kBuckets], rcount[kBuckets];
    {
      V3 acc_lo = bmin[0], acc_hi = bmax[0];
      int64_t acc_n = 0;
      for (int b = 0; b < kBuckets; ++b) {
        acc_lo = vmin(acc_lo, bmin[b]);
        acc_hi = vmax(acc_hi, bmax[b]);
        acc_n += counts[b];
        lcount[b] = acc_n;
        larea[b] = acc_n ? area(acc_lo, acc_hi) : 0.0;
      }
      acc_lo = bmin[kBuckets - 1];
      acc_hi = bmax[kBuckets - 1];
      acc_n = 0;
      for (int b = kBuckets - 1; b >= 0; --b) {
        acc_lo = vmin(acc_lo, bmin[b]);
        acc_hi = vmax(acc_hi, bmax[b]);
        acc_n += counts[b];
        rcount[b] = acc_n;
        rarea[b] = acc_n ? area(acc_lo, acc_hi) : 0.0;
      }
    }
    const double sa_total = std::max(area(b_lo, b_hi), 1e-30);
    int best = -1;
    double best_cost = std::numeric_limits<double>::infinity();
    for (int b = 0; b < kBuckets - 1; ++b) {
      if (lcount[b] == 0 || rcount[b + 1] == 0) continue;
      const double cost =
          kTraversalCost + kIntersectCost *
                               (lcount[b] * larea[b] +
                                rcount[b + 1] * rarea[b + 1]) /
                               sa_total;
      if (cost < best_cost) {
        best_cost = cost;
        best = b;
      }
    }

    int64_t mid;
    if (best < 0) {
      std::nth_element(order + start, order + start + n / 2, order + end,
                       [&](int64_t a, int64_t b2) {
                         return centroid[a][ax] < centroid[b2][ax];
                       });
      mid = start + n / 2;
    } else {
      int64_t* split = std::partition(
          order + start, order + end,
          [&](int64_t prim) { return bucket_of(prim) <= best; });
      mid = split - order;
      if (mid == start || mid == end) {
        std::nth_element(order + start, order + start + n / 2, order + end,
                         [&](int64_t a, int64_t b2) {
                           return centroid[a][ax] < centroid[b2][ax];
                         });
        mid = start + n / 2;
      }
    }

    naxis[node] = ax;
    ncount[node] = 0;
    work.push_back({mid, end, node});   // right child: fixes nright[node]
    work.push_back({start, mid, -1});   // left child: emitted next = node+1
  }
};

}  // namespace

extern "C" {

// Returns node count (>0) on success, -1 on error.  Output arrays must hold
// at least 2*t - 1 nodes.  `order` must be initialized to 0..t-1.
int64_t lt_build_bvh(const double* lo, const double* hi,
                     const double* centroid, int64_t t, int32_t max_leaf,
                     double* out_min, double* out_max, int32_t* out_right,
                     int32_t* out_first, int32_t* out_count,
                     int32_t* out_axis, int64_t* order) {
  if (t <= 0 || max_leaf < 1) return -1;
  Builder b;
  b.lo = reinterpret_cast<const V3*>(lo);
  b.hi = reinterpret_cast<const V3*>(hi);
  b.centroid = reinterpret_cast<const V3*>(centroid);
  b.max_leaf = max_leaf;
  b.order = order;
  b.nmin.reserve(2 * t);
  b.nmax.reserve(2 * t);
  b.nright.reserve(2 * t);
  b.nfirst.reserve(2 * t);
  b.ncount.reserve(2 * t);
  b.naxis.reserve(2 * t);
  b.build(0, t);
  const int64_t m = static_cast<int64_t>(b.ncount.size());
  if (m > 2 * t) return -1;
  std::memcpy(out_min, b.nmin.data(), m * sizeof(V3));
  std::memcpy(out_max, b.nmax.data(), m * sizeof(V3));
  std::memcpy(out_right, b.nright.data(), m * sizeof(int32_t));
  std::memcpy(out_first, b.nfirst.data(), m * sizeof(int32_t));
  std::memcpy(out_count, b.ncount.data(), m * sizeof(int32_t));
  std::memcpy(out_axis, b.naxis.data(), m * sizeof(int32_t));
  return m;
}

}  // extern "C"
