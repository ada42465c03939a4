// Native BVH builder — C++ equivalent of the reference's hot host-side
// construction (src/objects/bvhwrapper.rs:46-80): top-down median split on
// the longest axis of the span's enclosing box, primitives stable-sorted by
// bbox-min along that axis. Emits the same flat DFS/skip-link layout as the
// NumPy builder in ops/bvh.py (left child = i+1, miss = subtree end), so
// the two are drop-in interchangeable; this one is ~50x faster for
// 100K+ primitive meshes and is loaded via ctypes (no pybind11 in the
// image).
//
// Build: g++ -O2 -shared -fPIC -o _native_bvh.so bvh_builder.cpp
// (done lazily by crucible_tpu.native on first use).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Frame {
  int64_t lo, hi;       // span into perm[]
  int32_t parent;       // parent node index (-1 root)
  int8_t state;         // 0 = enter, 1 = exit (children built)
  int32_t node;         // node index (valid in exit state)
};

}  // namespace

extern "C" {

// Returns the number of nodes written, or -1 on capacity overflow.
// Output arrays must hold at least 4*m + 2 entries (node_*), m (perm).
int64_t crucible_build_bvh(const float* bb_min, const float* bb_max,
                           int64_t m, int64_t leaf_size,
                           float* node_min, float* node_max,
                           int32_t* node_first, int32_t* node_count,
                           int32_t* node_miss, int32_t* node_parent,
                           int32_t* perm) {
  if (m <= 0) return -1;
  const int64_t cap = 4 * m + 2;

  std::vector<int32_t> order(m);
  for (int64_t i = 0; i < m; ++i) order[i] = static_cast<int32_t>(i);

  std::vector<Frame> stack;
  stack.reserve(128);
  stack.push_back({0, m, -1, 0, -1});

  int64_t num_nodes = 0;
  int64_t perm_len = 0;

  while (!stack.empty()) {
    Frame f = stack.back();
    stack.pop_back();

    if (f.state == 1) {
      // Subtree finished: miss link = first node after the subtree.
      node_miss[f.node] = static_cast<int32_t>(num_nodes);
      continue;
    }

    if (num_nodes >= cap) return -1;
    const int32_t idx = static_cast<int32_t>(num_nodes++);

    // Enclosing box of the span.
    float lo[3] = {3.4e38f, 3.4e38f, 3.4e38f};
    float hi[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    for (int64_t i = f.lo; i < f.hi; ++i) {
      const int32_t p = order[i];
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], bb_min[3 * p + a]);
        hi[a] = std::max(hi[a], bb_max[3 * p + a]);
      }
    }
    std::memcpy(node_min + 3 * idx, lo, sizeof lo);
    std::memcpy(node_max + 3 * idx, hi, sizeof hi);
    node_parent[idx] = f.parent;

    const int64_t span = f.hi - f.lo;
    if (span <= leaf_size) {
      node_first[idx] = static_cast<int32_t>(perm_len);
      node_count[idx] = static_cast<int32_t>(span);
      node_miss[idx] = static_cast<int32_t>(num_nodes);  // i + 1 for leaves
      for (int64_t i = f.lo; i < f.hi; ++i) perm[perm_len++] = order[i];
      // miss will be finalized as num_nodes below for leaves: already num_nodes
      // (no children), which equals subtree end.
      continue;
    }

    node_first[idx] = 0;
    node_count[idx] = 0;

    // Longest axis of the enclosing box (bvh.rs:82-94).
    int axis = 0;
    float best = hi[0] - lo[0];
    for (int a = 1; a < 3; ++a) {
      const float ext = hi[a] - lo[a];
      if (ext > best) { best = ext; axis = a; }
    }
    std::stable_sort(order.begin() + f.lo, order.begin() + f.hi,
                     [bb_min, axis](int32_t x, int32_t y) {
                       return bb_min[3 * x + axis] < bb_min[3 * y + axis];
                     });
    const int64_t mid = f.lo + span / 2;

    // Exit frame first (LIFO), then right, then left so left is emitted
    // immediately after this node (DFS: left = idx + 1).
    stack.push_back({0, 0, -1, 1, idx});
    stack.push_back({mid, f.hi, idx, 0, -1});
    stack.push_back({f.lo, mid, idx, 0, -1});
  }
  return num_nodes;
}

}  // extern "C"
