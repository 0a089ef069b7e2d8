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
//
// Parallel build: because every leaf holds exactly one triangle, a subtree
// over `c` triangles emits exactly 2c-1 nodes — so the serial top-down
// phase can DEFER any small-enough range, pre-advance the node counter by
// its exact size, and hand the range to a worker thread that emits it at
// its precomputed node base. The output is byte-identical for any thread
// count (same splits, same preorder node numbering).
//
// SIMD: AABB grow/binning run on 4-wide vector min/max (SSE; compiled
// with -march=native so AVX encodings are used where available) — the
// fourth lane rides along and is ignored.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <thread>
#include <vector>

#if defined(__SSE2__) || defined(__x86_64__)
#define ORT_SIMD 1
#include <immintrin.h>
#endif

namespace {

constexpr int kNumBins = 16;
// Below this count, binned SAH is pure overhead (the 96 bin-AABB inits
// alone dwarf the work): sort the range once on its largest centroid
// axis and emit the subtree with median splits.
constexpr int kSmall = 32;
constexpr float kInf = std::numeric_limits<float>::infinity();

struct Aabb {
#ifdef ORT_SIMD
  // 4-wide min/max; lane 3 rides along (inputs padded, outputs ignored).
  __m128 vlo = _mm_set1_ps(kInf);
  __m128 vhi = _mm_set1_ps(-kInf);

  void grow(const float* l, const float* h) {
    vlo = _mm_min_ps(vlo, _mm_loadu_ps(l));
    vhi = _mm_max_ps(vhi, _mm_loadu_ps(h));
  }
  void grow(const Aabb& o) {
    vlo = _mm_min_ps(vlo, o.vlo);
    vhi = _mm_max_ps(vhi, o.vhi);
  }
  void store(float* lo_out, float* hi_out) const {
    float tmp[4];
    _mm_storeu_ps(tmp, vlo);
    std::memcpy(lo_out, tmp, 12);
    _mm_storeu_ps(tmp, vhi);
    std::memcpy(hi_out, tmp, 12);
  }
  float half_area() const {
    float lo[4], hi[4];
    _mm_storeu_ps(lo, vlo);
    _mm_storeu_ps(hi, vhi);
    float dx = std::max(hi[0] - lo[0], 0.f);
    float dy = std::max(hi[1] - lo[1], 0.f);
    float dz = std::max(hi[2] - lo[2], 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
#else
  float lo[3] = {kInf, kInf, kInf};
  float hi[3] = {-kInf, -kInf, -kInf};

  void grow(const float* l, const float* h) {
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], l[k]);
      hi[k] = std::max(hi[k], h[k]);
    }
  }
  void grow(const Aabb& o) { grow(o.lo, o.hi); }
  void store(float* lo_out, float* hi_out) const {
    std::memcpy(lo_out, lo, 12);
    std::memcpy(hi_out, hi, 12);
  }
  float half_area() const {
    float dx = std::max(hi[0] - lo[0], 0.f);
    float dy = std::max(hi[1] - lo[1], 0.f);
    float dz = std::max(hi[2] - lo[2], 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
#endif
  void grow_point(const float* p) { grow(p, p); }
  float lo_at(int k) const {
#ifdef ORT_SIMD
    float t[4];
    _mm_storeu_ps(t, vlo);
    return t[k];
#else
    return lo[k];
#endif
  }
  float hi_at(int k) const {
#ifdef ORT_SIMD
    float t[4];
    _mm_storeu_ps(t, vhi);
    return t[k];
#else
    return hi[k];
#endif
  }
};

struct Builder {
  // Working arrays kept IN PARTITION ORDER (data moves with the ids):
  // every per-node pass is a sequential read, which is the difference
  // between ~0.7 and ~5+ Mtris/s — pointer-chasing through a permutation
  // index made the build memory-latency-bound.
  float* tri_lo;         // [n+pad, 3], reordered in place
  float* tri_hi;
  float* centroid;
  float* node_lo;        // [2n-1, 3]
  float* node_hi;
  int32_t* node_skip;
  int32_t* node_prim;
  int32_t* order;        // triangle ids, same order as the data arrays
  int32_t next_node = 0;

  // Work items: count > 0 → emit the subtree over [first, first+count);
  // count == 0 → the subtree rooted at node index `first` just closed, so
  // its escape index is known: the next node to be allocated. Internal
  // tasks carry the EXACT centroid bounds of their range (derived from
  // the parent's per-bin centroid bounds), killing a whole pass per node.
  struct Task {
    int32_t first;
    int32_t count;
    Aabb cb;
    bool have_cb;
    bool sorted = false;   // small-range fast path: already axis-sorted
  };

  int32_t grain = 0;               // count <= grain → hand to a worker
  struct Deferred {
    int32_t first;
    int32_t count;
    int32_t node_base;
    Aabb cb;
    bool have_cb;
  };
  std::vector<Deferred> deferred;

  // Emit all subtrees in preorder with an explicit work stack — degenerate
  // splits (1 vs n-1 repeatedly) give O(n) DEPTH, which would overflow the
  // host stack on large meshes if this recursed.
  void build(int32_t num_tris) {
    std::vector<Task> stack;
    stack.push_back({0, num_tris, Aabb(), false});
    run(&stack, /*defer=*/true);
  }

  // Emit one deferred subtree at its precomputed node base (thread-safe:
  // disjoint node and data ranges).
  void build_subtree(const Deferred& d) {
    next_node = d.node_base;
    std::vector<Task> stack;
    stack.push_back({d.first, d.count, d.cb, d.have_cb});
    run(&stack, /*defer=*/false);
  }

  void run(std::vector<Task>* stack, bool defer) {
    while (!stack->empty()) {
      const Task task = stack->back();
      stack->pop_back();
      if (task.count == 0) {  // close marker
        node_skip[task.first] = next_node;
        continue;
      }
      if (defer && grain > 0 && task.count <= grain && task.count > 1) {
        // Defer to a worker: a c-triangle subtree is exactly 2c-1 nodes
        // (1-triangle leaves), so pre-advancing the counter keeps every
        // later node index — and all escape indices — byte-identical to
        // the serial build.
        deferred.push_back({task.first, task.count, next_node,
                            task.cb, task.have_cb});
        next_node += 2 * task.count - 1;
        continue;
      }
      emit_node(task, stack);
    }
  }

  // Allocate one node over [first, first+count); push children (left on
  // top so preorder is preserved) plus a close marker for internals.
  // ONE fused pass bins all 3 axes, tracks per-bin centroid bounds (the
  // children inherit exact centroid bounds from the split axis's bins),
  // and unions axis-0 bins into the node bounds.
  void emit_node(const Task& task, std::vector<Task>* stack) {
    const int32_t first = task.first;
    const int32_t count = task.count;
    const int32_t node = next_node++;
    if (count == 1) {
      Aabb bounds;
      bounds.grow(tri_lo + 3 * first, tri_hi + 3 * first);
      bounds.store(node_lo + 3 * node, node_hi + 3 * node);
      node_prim[node] = order[first];
      node_skip[node] = node + 1;
      return;
    }
    node_prim[node] = -1;

    if (count <= kSmall) {
      Aabb bounds;
      for (int32_t i = first; i < first + count; ++i)
        bounds.grow(tri_lo + 3 * i, tri_hi + 3 * i);
      bounds.store(node_lo + 3 * node, node_hi + 3 * node);
      if (!task.sorted) {
        // largest centroid axis, then insertion sort moving the data
        Aabb cb2;
        for (int32_t i = first; i < first + count; ++i)
          cb2.grow_point(centroid + 3 * i);
        int axis = 0;
        float ext = -1.f;
        for (int k = 0; k < 3; ++k) {
          const float e = cb2.hi_at(k) - cb2.lo_at(k);
          if (e > ext) {
            ext = e;
            axis = k;
          }
        }
        for (int32_t i = first + 1; i < first + count; ++i)
          for (int32_t j = i;
               j > first && centroid[3 * j + axis]
                          < centroid[3 * (j - 1) + axis]; --j)
            swap_tri(j, j - 1);
      }
      const int32_t mid = first + count / 2;
      stack->push_back({node, 0, Aabb(), false});
      stack->push_back({mid, first + count - mid, Aabb(), false, true});
      stack->push_back({first, mid - first, Aabb(), false, true});
      return;
    }

    Aabb cb = task.cb;
    if (!task.have_cb) {
      cb = Aabb();
      for (int32_t i = first; i < first + count; ++i)
        cb.grow_point(centroid + 3 * i);
    }

    float clo[3], inv[3];
    for (int axis = 0; axis < 3; ++axis) {
      clo[axis] = cb.lo_at(axis);
      const float extent = cb.hi_at(axis) - clo[axis];
      inv[axis] = extent > 0.f ? kNumBins / extent : 0.f;
    }
    Aabb bins[3][kNumBins];      // triangle bounds per bin
    Aabb bins_cb[3][kNumBins];   // centroid bounds per bin
    int bin_count[3][kNumBins] = {};
    for (int32_t i = first; i < first + count; ++i) {
      const float* l = tri_lo + 3 * i;
      const float* h = tri_hi + 3 * i;
      const float* c = centroid + 3 * i;
      for (int axis = 0; axis < 3; ++axis) {
        int b = static_cast<int>((c[axis] - clo[axis]) * inv[axis]);
        b = std::min(std::max(b, 0), kNumBins - 1);
        bins[axis][b].grow(l, h);
        bins_cb[axis][b].grow_point(c);
        ++bin_count[axis][b];
      }
    }
    Aabb bounds;
    for (int b = 0; b < kNumBins; ++b) bounds.grow(bins[0][b]);
    bounds.store(node_lo + 3 * node, node_hi + 3 * node);

    int best_axis = -1, best_split = -1;
    float best_cost = kInf;
    for (int axis = 0; axis < 3; ++axis) {
      if (inv[axis] == 0.f) continue;
      float left_area[kNumBins], right_area[kNumBins];
      int left_cnt[kNumBins], right_cnt[kNumBins];
      Aabb acc;
      int cnt = 0;
      for (int b = 0; b < kNumBins; ++b) {
        acc.grow(bins[axis][b]);
        cnt += bin_count[axis][b];
        left_area[b] = acc.half_area();
        left_cnt[b] = cnt;
      }
      acc = Aabb();
      cnt = 0;
      for (int b = kNumBins - 1; b >= 0; --b) {
        acc.grow(bins[axis][b]);
        cnt += bin_count[axis][b];
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
    Aabb cb_l, cb_r;
    bool have_child_cb = false;
    if (best_axis < 0) {
      mid = first + count / 2;  // degenerate centroids: median split
    } else {
      const float lo_ax = clo[best_axis];
      const float inv_ax = inv[best_axis];
      auto bin_of = [&](int32_t i) {
        int b = static_cast<int>(
            (centroid[3 * i + best_axis] - lo_ax) * inv_ax);
        return std::min(std::max(b, 0), kNumBins - 1);
      };
      // two-pointer partition moving the DATA with the ids
      int32_t a = first, z = first + count - 1;
      while (a <= z) {
        if (bin_of(a) <= best_split) {
          ++a;
        } else {
          swap_tri(a, z);
          --z;
        }
      }
      mid = a;
      if (mid == first || mid == first + count) {
        mid = first + count / 2;
      } else {
        for (int b = 0; b <= best_split; ++b) cb_l.grow(bins_cb[best_axis][b]);
        for (int b = best_split + 1; b < kNumBins; ++b)
          cb_r.grow(bins_cb[best_axis][b]);
        have_child_cb = true;
      }
    }

    stack->push_back({node, 0, Aabb(), false});  // close marker
    stack->push_back({mid, first + count - mid, cb_r, have_child_cb});
    stack->push_back({first, mid - first, cb_l, have_child_cb});
  }

  void swap_tri(int32_t a, int32_t z) {
    std::swap(order[a], order[z]);
    for (int k = 0; k < 3; ++k) {
      std::swap(tri_lo[3 * a + k], tri_lo[3 * z + k]);
      std::swap(tri_hi[3 * a + k], tri_hi[3 * z + k]);
      std::swap(centroid[3 * a + k], centroid[3 * z + k]);
    }
  }
};

}  // namespace

extern "C" {

// Returns the number of nodes written (2n-1), or -1 on bad input.
// Output arrays must hold 2n-1 entries (x3 for lo/hi). num_threads <= 1
// builds serially; more run the deferred-subtree phase on workers — the
// output is byte-identical either way.
int32_t ort_build_bvh_sah_mt(const float* tri_lo, const float* tri_hi,
                             const float* centroid, int32_t num_tris,
                             float* node_lo, float* node_hi,
                             int32_t* node_skip, int32_t* node_prim,
                             int32_t num_threads) {
  if (num_tris <= 0) return -1;
  // Pad input copies by one float so 4-wide loads at the last triangle
  // stay in bounds.
  std::vector<float> lo_p(3 * num_tris + 1), hi_p(3 * num_tris + 1),
      c_p(3 * num_tris + 1);
  std::memcpy(lo_p.data(), tri_lo, 12 * num_tris);
  std::memcpy(hi_p.data(), tri_hi, 12 * num_tris);
  std::memcpy(c_p.data(), centroid, 12 * num_tris);
  std::vector<int32_t> order(num_tris);
  for (int32_t i = 0; i < num_tris; ++i) order[i] = i;

  Builder b;
  b.tri_lo = lo_p.data();
  b.tri_hi = hi_p.data();
  b.centroid = c_p.data();
  b.node_lo = node_lo;
  b.node_hi = node_hi;
  b.node_skip = node_skip;
  b.node_prim = node_prim;
  b.order = order.data();
  if (num_threads > 1) {
    b.grain = std::max(num_tris / (num_threads * 8), 4096);
    if (b.grain >= num_tris) b.grain = 0;  // too small to bother
  }
  b.build(num_tris);
  // next_node already accounts for deferred subtrees (the serial phase
  // pre-advances it by each one's exact 2c-1 size).
  const int32_t total = b.next_node;
  if (getenv("ORT_BVH_DEBUG"))
    fprintf(stderr, "deferred=%zu grain=%d\n", b.deferred.size(), b.grain);
  if (!b.deferred.empty()) {
    std::vector<std::thread> pool;
    std::atomic<size_t> cursor{0};
    const int nw = std::min<int>(num_threads, (int)b.deferred.size());
    for (int w = 0; w < nw; ++w) {
      pool.emplace_back([&b, &cursor] {
        Builder local = b;  // cheap: pointers + counters
        for (;;) {
          const size_t i = cursor.fetch_add(1);
          if (i >= b.deferred.size()) break;
          local.build_subtree(b.deferred[i]);
        }
      });
    }
    for (auto& t : pool) t.join();
  }
  return total;
}

int32_t ort_build_bvh_sah(const float* tri_lo, const float* tri_hi,
                          const float* centroid, int32_t num_tris,
                          float* node_lo, float* node_hi,
                          int32_t* node_skip, int32_t* node_prim) {
  return ort_build_bvh_sah_mt(tri_lo, tri_hi, centroid, num_tris, node_lo,
                              node_hi, node_skip, node_prim, 1);
}

// SAH cost of a threaded BVH (for build-quality comparison/telemetry).
// Scalar math: node arrays are caller-sized, no padding for wide loads.
float ort_bvh_sah_cost(const float* node_lo, const float* node_hi,
                       const int32_t* node_prim, int32_t num_nodes) {
  if (num_nodes <= 0) return 0.f;
  auto half_area = [](const float* lo, const float* hi) {
    const float dx = std::max(hi[0] - lo[0], 0.f);
    const float dy = std::max(hi[1] - lo[1], 0.f);
    const float dz = std::max(hi[2] - lo[2], 0.f);
    return dx * dy + dy * dz + dz * dx;
  };
  const float root_area = std::max(half_area(node_lo, node_hi), 1e-20f);
  float cost = 0.f;
  for (int32_t i = 0; i < num_nodes; ++i) {
    const float w = half_area(node_lo + 3 * i, node_hi + 3 * i) / root_area;
    cost += (node_prim[i] >= 0) ? w : 1.2f * w;
  }
  return cost;
}

}  // extern "C"
