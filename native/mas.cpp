// Host-side Monotonic Alignment Search, C++/OpenMP.
//
// Semantics contract: reference monotonic_align/core.pyx:7-42 — per-item
// Viterbi DP over (frame y, token x) with unit x-steps, in-place value
// update, greedy backtrack; batch-parallel. Used as the host fallback /
// preprocessing path; the on-device implementations live in
// mb_istft_vits_tpu/ops/mas.py (lax.scan) and mas_pallas.py (TPU kernel).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC mas.cpp -o libmas.so

#include <algorithm>
#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr float kMaxNeg = -1e9f;

void maximum_path_each(float* value, int32_t* path, int t_y, int t_x,
                       int stride) {
  // Degenerate extents guard. t_x == 0 would make the backtrack write
  // path[y*stride - 1] (out of bounds: heap before the array for item 0,
  // the previous item's slab otherwise). t_x > t_y has no monotonic
  // alignment at all — the reference core.pyx reads out of bounds there
  // too — so degrade to a defined 1:1 prefix alignment instead.
  if (t_x <= 0 || t_y <= 0) return;
  if (t_x > t_y) t_x = t_y;
  // forward DP: value[y*stride + x] += max(advance, stay)
  for (int y = 0; y < t_y; ++y) {
    const int x_lo = std::max(0, t_x + y - t_y);
    const int x_hi = std::min(t_x, y + 1);
    float* row = value + static_cast<int64_t>(y) * stride;
    const float* prev = row - stride;
    for (int x = x_lo; x < x_hi; ++x) {
      const float v_cur = (x == y) ? kMaxNeg : prev[x];
      const float v_prev =
          (x == 0) ? ((y == 0) ? 0.0f : kMaxNeg) : prev[x - 1];
      row[x] += std::max(v_prev, v_cur);
    }
  }
  // backtrack
  int index = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[static_cast<int64_t>(y) * stride + index] = 1;
    if (index != 0) {
      const float* prev = value + static_cast<int64_t>(y - 1) * stride;
      if (index == y || prev[index] < prev[index - 1]) {
        --index;
      }
    }
  }
}

}  // namespace

extern "C" {

// values:  [b, t_y_max, t_x_max] float32, masked-invalid cells ignored;
//          modified in place (DP accumulates into it).
// paths:   [b, t_y_max, t_x_max] int32, zero-initialized by the caller.
// t_ys/t_xs: per-item valid extents.
void mas_maximum_path(float* values, int32_t* paths, const int32_t* t_ys,
                      const int32_t* t_xs, int b, int t_y_max,
                      int t_x_max) {
  const int64_t item = static_cast<int64_t>(t_y_max) * t_x_max;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < b; ++i) {
    maximum_path_each(values + i * item, paths + i * item, t_ys[i], t_xs[i],
                      t_x_max);
  }
}

int mas_has_openmp() {
#ifdef _OPENMP
  return 1;
#else
  return 0;
#endif
}

}  // extern "C"
