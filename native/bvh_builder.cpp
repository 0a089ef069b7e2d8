// Binned-SAH BVH builder — the native host-side "graph builder" of the
// framework's runtime, playing the role the reference's driver-side
// optixAccelBuild plays for high-quality builds (include/optix_host.h:562).
//
// Emits the exact threaded (DFS + escape-index) layout the JAX traversal
// kernel consumes (optix_raytracer_tpu/accel/lbvh.py LBVH struct): the
// Python side hands numpy arrays across ctypes, no copies.
//
// Build: 16-bin surface-area-heuristic sweep per axis, preorder emission so
// escape indices are assigned as each subtree closes. Iterative explicit
// stack — no recursion-depth limits on huge meshes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kNumBins = 16;
constexpr float kInf = std::numeric_limits<float>::infinity();

struct Aabb {
  float lo[3] = {kInf, kInf, kInf};
  float hi[3] = {-kInf, -kInf, -kInf};

  void grow(const float* l, const float* h) {
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], l[k]);
      hi[k] = std::max(hi[k], h[k]);
    }
  }
  void grow_point(const float* p) { grow(p, p); }
  float half_area() const {
    float dx = std::max(hi[0] - lo[0], 0.f);
    float dy = std::max(hi[1] - lo[1], 0.f);
    float dz = std::max(hi[2] - lo[2], 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct Builder {
  const float* tri_lo;   // [n, 3]
  const float* tri_hi;   // [n, 3]
  const float* centroid; // [n, 3]
  float* node_lo;        // [2n-1, 3]
  float* node_hi;
  int32_t* node_skip;
  int32_t* node_prim;
  std::vector<int32_t> order;  // permutation of triangle ids
  int32_t next_node = 0;

  // Work items: count > 0 → emit the subtree over order[first, first+count);
  // count == 0 → the subtree rooted at `first` (a node index) just closed,
  // so its escape index is known: the next node to be allocated.
  struct Task {
    int32_t first;
    int32_t count;
  };

  // Emit all subtrees in preorder with an explicit work stack — degenerate
  // splits (1 vs n-1 repeatedly) give O(n) DEPTH, which would overflow the
  // host stack on large meshes if this recursed.
  void build(int32_t num_tris) {
    std::vector<Task> stack;
    stack.push_back({0, num_tris});
    while (!stack.empty()) {
      const Task task = stack.back();
      stack.pop_back();
      if (task.count == 0) {  // close marker
        node_skip[task.first] = next_node;
        continue;
      }
      emit_node(task.first, task.count, &stack);
    }
  }

  // Allocate one node over order[first, first+count); push children (left
  // on top so preorder is preserved) plus a close marker for internals.
  void emit_node(int32_t first, int32_t count, std::vector<Task>* stack) {
    int32_t node = next_node++;
    Aabb bounds;
    for (int32_t i = first; i < first + count; ++i) {
      const int32_t t = order[i];
      bounds.grow(tri_lo + 3 * t, tri_hi + 3 * t);
    }
    std::memcpy(node_lo + 3 * node, bounds.lo, 12);
    std::memcpy(node_hi + 3 * node, bounds.hi, 12);

    if (count == 1) {
      node_prim[node] = order[first];
      node_skip[node] = node + 1;
      return;
    }
    node_prim[node] = -1;

    // --- binned SAH over the centroid bounds ---
    Aabb cb;
    for (int32_t i = first; i < first + count; ++i)
      cb.grow_point(centroid + 3 * order[i]);

    int best_axis = -1, best_split = -1;
    float best_cost = kInf;
    for (int axis = 0; axis < 3; ++axis) {
      const float extent = cb.hi[axis] - cb.lo[axis];
      if (extent <= 0.f) continue;
      const float inv = kNumBins / extent;
      Aabb bins[kNumBins];
      int bin_count[kNumBins] = {0};
      for (int32_t i = first; i < first + count; ++i) {
        const int32_t t = order[i];
        int b = static_cast<int>((centroid[3 * t + axis] - cb.lo[axis]) * inv);
        b = std::min(std::max(b, 0), kNumBins - 1);
        bins[b].grow(tri_lo + 3 * t, tri_hi + 3 * t);
        ++bin_count[b];
      }
      // sweep: prefix/suffix areas
      float left_area[kNumBins], right_area[kNumBins];
      int left_cnt[kNumBins], right_cnt[kNumBins];
      Aabb acc;
      int cnt = 0;
      for (int b = 0; b < kNumBins; ++b) {
        acc.grow(bins[b].lo, bins[b].hi);
        cnt += bin_count[b];
        left_area[b] = acc.half_area();
        left_cnt[b] = cnt;
      }
      acc = Aabb();
      cnt = 0;
      for (int b = kNumBins - 1; b >= 0; --b) {
        acc.grow(bins[b].lo, bins[b].hi);
        cnt += bin_count[b];
        right_area[b] = acc.half_area();
        right_cnt[b] = cnt;
      }
      for (int b = 0; b < kNumBins - 1; ++b) {
        if (left_cnt[b] == 0 || right_cnt[b + 1] == 0) continue;
        const float cost = left_area[b] * left_cnt[b]
                         + right_area[b + 1] * right_cnt[b + 1];
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = axis;
          best_split = b;
        }
      }
    }

    int32_t mid;
    if (best_axis < 0) {
      mid = first + count / 2;  // degenerate centroids: median split
    } else {
      const float extent = cb.hi[best_axis] - cb.lo[best_axis];
      const float inv = kNumBins / extent;
      auto it = std::partition(
          order.begin() + first, order.begin() + first + count,
          [&](int32_t t) {
            int b = static_cast<int>(
                (centroid[3 * t + best_axis] - cb.lo[best_axis]) * inv);
            b = std::min(std::max(b, 0), kNumBins - 1);
            return b <= best_split;
          });
      mid = static_cast<int32_t>(it - order.begin());
      if (mid == first || mid == first + count) mid = first + count / 2;
    }

    stack->push_back({node, 0});  // close marker: set skip after subtree
    stack->push_back({mid, first + count - mid});  // right child
    stack->push_back({first, mid - first});        // left child (popped first)
  }
};

}  // namespace

extern "C" {

// Returns the number of nodes written (2n-1), or -1 on bad input.
// Output arrays must hold 2n-1 entries (x3 for lo/hi).
int32_t ort_build_bvh_sah(const float* tri_lo, const float* tri_hi,
                          const float* centroid, int32_t num_tris,
                          float* node_lo, float* node_hi,
                          int32_t* node_skip, int32_t* node_prim) {
  if (num_tris <= 0) return -1;
  Builder b;
  b.tri_lo = tri_lo;
  b.tri_hi = tri_hi;
  b.centroid = centroid;
  b.node_lo = node_lo;
  b.node_hi = node_hi;
  b.node_skip = node_skip;
  b.node_prim = node_prim;
  b.order.resize(num_tris);
  for (int32_t i = 0; i < num_tris; ++i) b.order[i] = i;
  b.build(num_tris);
  return b.next_node;
}

// SAH cost of a threaded BVH (for build-quality comparison/telemetry).
float ort_bvh_sah_cost(const float* node_lo, const float* node_hi,
                       const int32_t* node_prim, int32_t num_nodes) {
  if (num_nodes <= 0) return 0.f;
  Aabb root;
  root.grow(node_lo, node_hi);
  const float root_area = std::max(root.half_area(), 1e-20f);
  float cost = 0.f;
  for (int32_t i = 0; i < num_nodes; ++i) {
    Aabb box;
    box.grow(node_lo + 3 * i, node_hi + 3 * i);
    const float w = box.half_area() / root_area;
    cost += (node_prim[i] >= 0) ? w : 1.2f * w;
  }
  return cost;
}

}  // extern "C"
