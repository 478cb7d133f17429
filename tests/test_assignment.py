"""Auction LAP vs the exact scipy-based lapjv oracle.

Both solvers are optimal up to ties; we require (a) identical objective
value in the extended problem on every random instance, and (b) identical
matches on instances without near-ties (generic real-valued costs).
"""

import numpy as np
import jax.numpy as jnp

from botsort_tpu.ops import assignment
from tests.oracle import assignment_np

MAX_A, MAX_B = 24, 16


def run_padded(cost, thresh):
    n, m = cost.shape
    padded = np.zeros((MAX_A, MAX_B), dtype=np.float32)
    padded[:n, :m] = cost
    row_valid = np.zeros(MAX_A, dtype=bool)
    row_valid[:n] = True
    col_valid = np.zeros(MAX_B, dtype=bool)
    col_valid[:m] = True
    res = assignment.solve_masked(
        jnp.asarray(padded), jnp.asarray(row_valid), jnp.asarray(col_valid),
        thresh)
    return np.asarray(res.col_for_row)[:n], np.asarray(res.row_for_col)[:m]


def test_matches_oracle_objective_random():
    rng = np.random.default_rng(0)
    for trial in range(30):
        n = int(rng.integers(1, MAX_A + 1))
        m = int(rng.integers(1, MAX_B + 1))
        thresh = float(rng.choice([0.5, 0.7, 0.8]))
        cost = rng.uniform(0.0, 1.2, size=(n, m)).astype(np.float32)
        got_cfr, got_rfc = run_padded(cost, thresh)
        ref_cfr, ref_rfc = assignment_np.lapjv_cost_limit(
            cost.astype(np.float64), thresh)
        got_total = assignment_np.total_match_cost(cost, got_cfr, thresh)
        ref_total = assignment_np.total_match_cost(cost, ref_cfr, thresh)
        assert abs(got_total - ref_total) < 1e-3, (
            f"trial {trial}: auction {got_total} vs oracle {ref_total}")
        # Consistency of the two output views.
        for r, c in enumerate(got_cfr):
            if c >= 0:
                assert got_rfc[c] == r


def test_matches_exactly_on_generic_instances():
    # With well-separated random costs, the optimum is unique and the
    # auction must reproduce lapjv's matching exactly.
    rng = np.random.default_rng(1)
    agree = 0
    trials = 25
    for _ in range(trials):
        n = int(rng.integers(2, 12))
        m = int(rng.integers(2, 12))
        cost = np.round(rng.uniform(0.0, 1.0, size=(n, m)), 3).astype(
            np.float32) + rng.uniform(0, 1e-4, size=(n, m)).astype(np.float32)
        got_cfr, _ = run_padded(cost, 0.8)
        ref_cfr, _ = assignment_np.lapjv_cost_limit(
            cost.astype(np.float64), 0.8)
        if np.array_equal(got_cfr, ref_cfr):
            agree += 1
    assert agree >= trials - 1, f"only {agree}/{trials} exact agreements"


def test_cost_limit_rejects_expensive_pairs():
    # A single pair costing more than the limit must stay unmatched.
    cost = np.array([[0.95]], dtype=np.float32)
    cfr, rfc = run_padded(cost, 0.8)
    assert cfr[0] == -1 and rfc[0] == -1
    cost = np.array([[0.6]], dtype=np.float32)
    cfr, rfc = run_padded(cost, 0.8)
    assert cfr[0] == 0 and rfc[0] == 0


def test_empty_problem():
    cost = np.zeros((0, 3), dtype=np.float32)
    cfr, rfc = run_padded(cost, 0.8)
    assert cfr.size == 0
    assert (rfc == -1).all()


def test_all_padding_invalid():
    res = assignment.solve_masked(
        jnp.zeros((MAX_A, MAX_B)), jnp.zeros(MAX_A, dtype=bool),
        jnp.zeros(MAX_B, dtype=bool), 0.8)
    assert (np.asarray(res.col_for_row) == -1).all()
    assert (np.asarray(res.row_for_col) == -1).all()


def test_known_instance():
    # Hand-checked: greedy would pick (0,0); optimal is (0,1),(1,0).
    cost = np.array([[0.1, 0.3], [0.2, 0.9]], dtype=np.float32)
    cfr, _ = run_padded(cost, 0.8)
    # optimal total = 0.3 + 0.2 = 0.5 < 0.1 + dummy costs for row1/col1
    # (0.1 + 0.4 + 0.4 = 0.9).
    assert list(cfr) == [1, 0]


def test_wide_matrices_more_cols_than_rows():
    # The cascade only ever solves tall problems (tracks x dets); the op
    # itself must also be exact for wide ones.
    rng = np.random.default_rng(7)
    for _ in range(10):
        n = int(rng.integers(1, 6))
        m = int(rng.integers(n, MAX_B + 1))
        thresh = 0.8
        cost = rng.uniform(0.0, 1.2, size=(n, m)).astype(np.float32)
        got_cfr, got_rfc = run_padded(cost, thresh)
        ref_cfr, _ = assignment_np.lapjv_cost_limit(
            cost.astype(np.float64), thresh)
        got_total = assignment_np.total_match_cost(cost, got_cfr, thresh)
        ref_total = assignment_np.total_match_cost(cost, ref_cfr, thresh)
        assert abs(got_total - ref_total) < 1e-3
        for r, c in enumerate(got_cfr):
            if c >= 0:
                assert got_rfc[c] == r
