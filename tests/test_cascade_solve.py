"""Fused cascade solver (assignment.solve_cascade_masked /
assignment_pallas.cascade_solve_pallas).

The kernel runs the cascade's three chained thresholded LAPs in one
launch, deriving the pass-2/3 masks from pass 1's matching in-kernel.
These tests pin it (interpret mode) against the three-solve composition
the CPU fallback uses — which itself is oracle-tested in
test_assignment.py — including degenerate masks, wide/tall shapes, and
the vmapped (multi-stream) route.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from botsort_tpu.ops import assignment
from botsort_tpu.ops.assignment_pallas import cascade_solve_pallas

LIMITS = (0.8, 0.5, 0.7)


def three_solves(d1, iou, d3, pool, tracked, unconf, high, low):
    res1 = assignment.solve_masked(d1, pool, high, LIMITS[0])
    rv2 = tracked & (res1.col_for_row < 0)
    res2 = assignment.solve_masked(iou, rv2, low, LIMITS[1])
    leftover = high & (res1.row_for_col < 0)
    res3 = assignment.solve_masked(d3, unconf, leftover, LIMITS[2])
    return res1, res2, res3


def random_instance(rng, n, d, empty_rows=False, empty_cols=False):
    d1 = jnp.asarray(rng.uniform(0, 1, (n, d)).astype(np.float32))
    iou = jnp.asarray(rng.uniform(0, 1, (n, d)).astype(np.float32))
    d3 = jnp.asarray(rng.uniform(0, 1, (n, d)).astype(np.float32))
    pool = rng.uniform(0, 1, n) < 0.6
    tracked = pool & (rng.uniform(0, 1, n) < 0.7)
    unconf = (~pool) & (rng.uniform(0, 1, n) < 0.4)
    high = rng.uniform(0, 1, d) < 0.6
    low = (~high) & (rng.uniform(0, 1, d) < 0.5)
    if empty_rows:
        pool[:] = tracked[:] = unconf[:] = False
    if empty_cols:
        high[:] = low[:] = False
    return (d1, iou, d3, jnp.asarray(pool), jnp.asarray(tracked),
            jnp.asarray(unconf), jnp.asarray(high), jnp.asarray(low))


def assert_matches(want, got):
    for p in range(3):
        np.testing.assert_array_equal(
            np.asarray(want[p].col_for_row), np.asarray(got[p][0]),
            err_msg=f"pass {p} col_for_row")
        np.testing.assert_array_equal(
            np.asarray(want[p].row_for_col), np.asarray(got[p][1]),
            err_msg=f"pass {p} row_for_col")


@pytest.mark.parametrize("n,d", [(12, 9), (5, 14), (16, 16), (3, 2)])
def test_fused_matches_three_solves(n, d):
    rng = np.random.default_rng(n * 100 + d)
    for _ in range(4):
        inst = random_instance(rng, n, d)
        want = three_solves(*inst)
        got = cascade_solve_pallas(*inst, LIMITS, interpret=True)
        assert_matches(want, got)


@pytest.mark.parametrize("empty_rows,empty_cols",
                         [(True, False), (False, True), (True, True)])
def test_fused_degenerate(empty_rows, empty_cols):
    rng = np.random.default_rng(7)
    inst = random_instance(rng, 10, 8, empty_rows, empty_cols)
    want = three_solves(*inst)
    got = cascade_solve_pallas(*inst, LIMITS, interpret=True)
    assert_matches(want, got)
    if empty_rows:
        assert (np.asarray(got[0][0]) == -1).all()


def test_fused_vmapped_multi_stream():
    """The multi-stream cascade vmaps the solver; the custom_vmap rule
    must route to one batched grid and agree with per-stream solves."""
    rng = np.random.default_rng(11)
    insts = [random_instance(rng, 8, 6) for _ in range(3)]
    batched = tuple(jnp.stack([inst[k] for inst in insts])
                    for k in range(8))

    def solve_one(*args):
        return cascade_solve_pallas(*args, LIMITS, interpret=True)

    got_b = jax.vmap(solve_one)(*batched)
    for s, inst in enumerate(insts):
        want = three_solves(*inst)
        for p in range(3):
            np.testing.assert_array_equal(
                np.asarray(want[p].col_for_row),
                np.asarray(got_b[p][0][s]))
            np.testing.assert_array_equal(
                np.asarray(want[p].row_for_col),
                np.asarray(got_b[p][1][s]))


def test_dispatcher_fallback_used_on_cpu():
    rng = np.random.default_rng(3)
    inst = random_instance(rng, 6, 5)
    want = three_solves(*inst)
    got = assignment.solve_cascade_masked(*inst, LIMITS)
    for p in range(3):
        np.testing.assert_array_equal(np.asarray(want[p].col_for_row),
                                      np.asarray(got[p].col_for_row))
        np.testing.assert_array_equal(np.asarray(want[p].row_for_col),
                                      np.asarray(got[p].row_for_col))
