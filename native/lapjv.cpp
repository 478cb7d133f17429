// Exact dense linear assignment (Jonker-Volgenant / Hungarian with
// potentials) — the TPU framework's native replacement for the
// reference's third-party `lap` 0.4.0 C++ solver
// (demo_bottrack_onnx_tflite.py:1686). Used as the host-mode solver and
// as the bit-exact oracle for the on-device auction solver.
//
// Build: make -C native   (produces liblapjv.so, loaded via ctypes by
// botsort_tpu/runtime/native.py)

#include <cstdint>
#include <limits>
#include <vector>

namespace {
constexpr double kInf = std::numeric_limits<double>::infinity();
}

extern "C" {

// Solve min-cost perfect assignment on a dense n x n matrix.
// cost: row-major n*n. Outputs: x[i] = column of row i,
// y[j] = row of column j. Returns total cost.
//
// Shortest-augmenting-path with dual potentials: O(n^3), exact.
double lapjv_square(int32_t n, const double* cost, int32_t* x, int32_t* y) {
  // 1-indexed internals; p[j] = row matched to column j (0 = none).
  std::vector<double> u(n + 1, 0.0), v(n + 1, 0.0);
  std::vector<int32_t> p(n + 1, 0), way(n + 1, 0);

  for (int32_t i = 1; i <= n; ++i) {
    p[0] = i;
    int32_t j0 = 0;
    std::vector<double> minv(n + 1, kInf);
    std::vector<uint8_t> used(n + 1, 0);
    do {
      used[j0] = 1;
      const int32_t i0 = p[j0];
      int32_t j1 = 0;
      double delta = kInf;
      const double* row = cost + static_cast<int64_t>(i0 - 1) * n;
      for (int32_t j = 1; j <= n; ++j) {
        if (used[j]) continue;
        const double cur = row[j - 1] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int32_t j = 0; j <= n; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      const int32_t j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0 != 0);
  }

  double total = 0.0;
  for (int32_t j = 1; j <= n; ++j) {
    const int32_t i = p[j];
    y[j - 1] = i - 1;
    if (i > 0) {
      x[i - 1] = j - 1;
      total += cost[static_cast<int64_t>(i - 1) * n + (j - 1)];
    }
  }
  return total;
}

// lap.lapjv(cost, extend_cost=True, cost_limit=limit) semantics for a
// rectangular n x m problem: embed in (n+m) x (n+m) with limit/2 dummy
// costs and a zero dummy-dummy block, solve exactly, report real matches.
// col_for_row: n entries (-1 unmatched); row_for_col: m entries.
double lapjv_cost_limit(int32_t n, int32_t m, const double* cost,
                        double limit, int32_t* col_for_row,
                        int32_t* row_for_col) {
  for (int32_t i = 0; i < n; ++i) col_for_row[i] = -1;
  for (int32_t j = 0; j < m; ++j) row_for_col[j] = -1;
  if (n == 0 || m == 0) return 0.0;
  const int32_t s = n + m;
  std::vector<double> ext(static_cast<int64_t>(s) * s, limit / 2.0);
  for (int32_t i = 0; i < n; ++i)
    for (int32_t j = 0; j < m; ++j)
      ext[static_cast<int64_t>(i) * s + j] = cost[static_cast<int64_t>(i) * m + j];
  for (int32_t i = n; i < s; ++i)
    for (int32_t j = m; j < s; ++j) ext[static_cast<int64_t>(i) * s + j] = 0.0;

  std::vector<int32_t> x(s), y(s);
  const double total = lapjv_square(s, ext.data(), x.data(), y.data());
  for (int32_t i = 0; i < n; ++i) {
    if (x[i] >= 0 && x[i] < m) {
      col_for_row[i] = x[i];
      row_for_col[x[i]] = i;
    }
  }
  return total;
}

}  // extern "C"
