"""Exact assignment oracle with lap.lapjv extend_cost/cost_limit semantics.

Replicates what ``lap.lapjv(cost, extend_cost=True, cost_limit=thresh)``
computes (demo_bottrack_onnx_tflite.py:1686) using scipy's exact
Jonker-Volgenant solver on the same extended square matrix lap builds:
top-left = cost, everywhere else cost_limit/2, bottom-right block = 0.
"""

import numpy as np
from scipy.optimize import linear_sum_assignment


def lapjv_cost_limit(cost: np.ndarray, cost_limit: float):
    """Returns (col_for_row [n], row_for_col [m]) with -1 for unmatched."""
    n, m = cost.shape
    col_for_row = np.full(n, -1, dtype=np.int64)
    row_for_col = np.full(m, -1, dtype=np.int64)
    if n == 0 or m == 0:
        return col_for_row, row_for_col
    s = n + m
    ext = np.full((s, s), cost_limit / 2.0, dtype=np.float64)
    ext[:n, :m] = cost
    ext[n:, m:] = 0.0
    rows, cols = linear_sum_assignment(ext)
    for r, c in zip(rows, cols):
        if r < n and c < m:
            col_for_row[r] = c
            row_for_col[c] = r
    return col_for_row, row_for_col


def total_match_cost(cost, col_for_row, cost_limit):
    """Objective value in the extended problem (for optimality comparison):
    matched pairs contribute their cost; every unmatched real row/col
    contributes cost_limit/2."""
    n, m = cost.shape
    total = 0.0
    matched_cols = set()
    for r in range(n):
        c = col_for_row[r]
        if c >= 0:
            total += float(cost[r, c])
            matched_cols.add(int(c))
        else:
            total += cost_limit / 2.0
    total += (m - len(matched_cols)) * cost_limit / 2.0
    return total
