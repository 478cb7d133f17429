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


def test_lockstep_matches_grid_kernel():
    """vmap routes to the LOCKSTEP kernel (all streams advance one
    Dijkstra pop per step on (B, sp) tiles — docs/PERF.md round 4); the
    serialized B-grid kernel remains as the A/B reference
    (BOTSORT_LOCKSTEP=0). Both must produce identical matchings on
    per-stream-varied instances, including streams with empty masks."""
    from botsort_tpu.ops import assignment_pallas as ap

    rng = np.random.default_rng(21)
    insts = [random_instance(rng, 10, 7) for _ in range(3)]
    insts.append(random_instance(rng, 10, 7, empty_cols=True))
    n, d = 10, 7
    sp = 128
    limits = tuple(float(x) for x in LIMITS)

    def prep(inst):
        """Replicate cascade_solve_pallas's host-side prep for one
        instance (padding, pre-parking, lane masks)."""
        d1, iou, d3, pool, tracked, unconf, high, low = inst

        def padded(c):
            return jnp.pad(c.astype(jnp.float32),
                           ((0, sp - n), (0, sp - d)))

        costs = jnp.stack([padded(d1), padded(iou), padded(d3)])
        f1 = pool[:, None] & high[None, :] & (d1 <= limits[0])
        pool_f = pool & jnp.any(f1, axis=1)
        high1_f = high & jnp.any(f1, axis=0)
        f2 = tracked[:, None] & low[None, :] & (iou <= limits[1])
        tracked_f = tracked & jnp.any(f2, axis=1)
        low_f = low & jnp.any(f2, axis=0)
        f3 = unconf[:, None] & high[None, :] & (d3 <= limits[2])
        unconf_f = unconf & jnp.any(f3, axis=1)
        high3_f = high & jnp.any(f3, axis=0)

        def lane(m, width):
            return jnp.pad(m.astype(jnp.int32), (0, sp - width))[None, :]

        big = (jnp.max(jnp.abs(costs[:, :n, :d])) + 1.8)[None]
        return (costs, lane(pool_f, n), lane(tracked_f, n),
                lane(unconf_f, n), lane(high1_f, d), lane(high3_f, d),
                lane(low_f, d), big)

    batched = [jnp.stack(x) for x in
               zip(*[prep(inst) for inst in insts])]
    grid = ap._cascade_call_batched(
        *batched, n, d, limits, 4096, True)
    lock = ap._cascade_call_lockstep(
        *batched, n, d, limits, 4096, True)
    for g, l, name in zip(grid, lock, ("p", "q", "plive")):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(l), err_msg=name)


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
