"""On-device linear assignment with cost-limit semantics.

The reference solves its three per-frame assignment problems with the C++
``lap.lapjv`` solver via ``lap.lapjv(cost, extend_cost=True,
cost_limit=thresh)`` (demo_bottrack_onnx_tflite.py:1682-1693), paying a
Python<->C++ host round-trip per call. Here the solver runs on the TPU as
part of the fused frame step.

cost-limit semantics (what lap does with extend_cost=True): an n x m
problem is embedded in an (n+m) x (n+m) square problem

    [ C            L/2 * ones ]      L = cost_limit
    [ L/2 * ones   0          ]

and solved exactly; row i is "matched" iff its square-problem partner is a
real column. A pair therefore matches iff keeping it is globally cheaper
than sending both endpoints to the dummy region (combined price L) — which
is how thresholded assignment behaves in BYTE/BoT-SORT.

Our solver is the **Jonker-Volgenant shortest-augmenting-path algorithm**
(the same family lap.lapjv implements), formulated over static shapes:
every Dijkstra step is masked [S]-wide vector work (relax one cost row,
argmin over unvisited columns, potential updates) inside nested
``lax.while_loop``s. Two structural choices keep the sequential step
count tiny: (1) padding slots are PRE-MATCHED to designated dummy
columns at zero potentials (their reduced costs are 0, so complementary
slackness holds and no augmentation is spent on them); (2) dummy columns
give every live row a cheap opt-out, so augmenting paths terminate after
1-3 pops in the common case. Total sequential steps ~ 2-4x the number of
live tracks+detections — not the padded size. The result is exact
(ties may resolve to a different, equally optimal matching than lap's
internal order). ``tests/test_assignment.py`` validates against a
scipy-based exact oracle, and ``botsort_tpu.runtime.native`` provides a
C++ LAPJV for host-mode use.

Shapes are fully static: ``solve_masked`` takes a padded [MAX_A, MAX_B]
cost matrix plus row/column validity masks, so the per-frame variation in
track/detection counts never changes the compiled program.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp



class AssignmentResult(NamedTuple):
    """SoA match description.

    col_for_row: [MAX_A] int32 — matched column index, -1 if unmatched.
    row_for_col: [MAX_B] int32 — matched row index, -1 if unmatched.
    Invalid (masked) rows/cols are always -1.
    """

    col_for_row: jnp.ndarray
    row_for_col: jnp.ndarray


# Plain float (a module-level jnp scalar would initialize the backend at
# import time, before callers can select a platform).
_INF = 1e30


def _jv_masked(ext: jnp.ndarray, parked: jnp.ndarray,
               parked_col: jnp.ndarray, max_iters: int) -> jnp.ndarray:
    """Exact square assignment on ext [S, S] (>= 0) via Jonker-Volgenant
    shortest augmenting paths with dual potentials.

    parked rows start matched to parked_col (distinct columns; reduced
    cost 0 at zero potentials, so complementary slackness holds) and are
    never augmented. Returns owner_row_for_col [S] int32.
    """
    s = ext.shape[0]
    rows = jnp.arange(s, dtype=jnp.int32)
    # p[j] = row matched to column j, -1 free.
    p0 = (
        jnp.full((s + 1,), -1, dtype=jnp.int32)
        .at[jnp.where(parked, parked_col, s)]
        .set(rows)[:s]
    )
    u0 = jnp.zeros((s,), jnp.float32)
    v0 = jnp.zeros((s,), jnp.float32)

    # Augment only live rows, in ascending index order (dynamic count —
    # the sequential cost scales with live entities, not padded size).
    live_order = jnp.sort(jnp.where(parked, s, rows))
    n_live = jnp.sum(jnp.logical_not(parked))

    def outer_body(st):
        k, p, u, v = st
        i = live_order[k]

        def do_augment(p, u, v):
            # Dijkstra from row i over columns; sentinel "from" col = s.
            minv = jnp.full((s,), _INF)
            way = jnp.full((s,), s, dtype=jnp.int32)
            used = jnp.zeros((s,), dtype=bool)
            on_path = jnp.zeros((s,), dtype=bool)  # rows whose u += delta

            def pop_cond(st):
                (_, _, _, _, _, _, _, done, it) = st
                return jnp.logical_and(jnp.logical_not(done),
                                       it < max_iters)

            def pop_body(st):
                (minv, way, used, on_path, u, v, cur, done, it) = st
                cur_row, j_from = cur
                on_path = on_path.at[cur_row].set(True)
                reduced = ext[cur_row] - u[cur_row] - v
                upd = jnp.logical_not(used) & (reduced < minv)
                minv = jnp.where(upd, reduced, minv)
                way = jnp.where(upd, j_from, way)
                masked = jnp.where(used, _INF, minv)
                j1 = jnp.argmin(masked).astype(jnp.int32)
                delta = masked[j1]
                u = u + delta * on_path
                v = v - delta * used
                minv = jnp.where(used, minv, minv - delta)
                used = used.at[j1].set(True)
                nxt_row = p[j1]
                done = nxt_row < 0
                cur = (jnp.where(done, cur_row, nxt_row), j1)
                return (minv, way, used, on_path, u, v, cur, done, it + 1)

            st = (minv, way, used, on_path, u, v,
                  (i, jnp.int32(s)), jnp.bool_(False), jnp.int32(0))
            (minv, way, used, on_path, u, v, cur, _, _) = (
                jax.lax.while_loop(pop_cond, pop_body, st))
            j_end = cur[1]

            # Unwind the alternating path back to the sentinel.
            def unwind_cond(st):
                _, j0, it = st
                return jnp.logical_and(j0 < s, it < max_iters)

            def unwind_body(st):
                p, j0, it = st
                j1 = way[j0]
                row = jnp.where(j1 >= s, i, p[jnp.minimum(j1, s - 1)])
                p = p.at[j0].set(row)
                return p, j1, it + 1

            p, _, _ = jax.lax.while_loop(
                unwind_cond, unwind_body, (p, j_end, jnp.int32(0)))
            return p, u, v

        p, u, v = do_augment(p, u, v)
        return k + 1, p, u, v

    def outer_cond(st):
        k = st[0]
        return k < n_live

    _, p, _, _ = jax.lax.while_loop(
        outer_cond, outer_body, (jnp.int32(0), p0, u0, v0))
    return p


@partial(jax.jit, static_argnames=("max_iters",))
def solve_masked(
    cost: jnp.ndarray,
    row_valid: jnp.ndarray,
    col_valid: jnp.ndarray,
    cost_limit: jnp.ndarray | float,
    max_iters: int = 20000,
) -> AssignmentResult:
    """Thresholded LAP over a padded cost matrix.

    cost: [MAX_A, MAX_B] float32 (entries at invalid rows/cols ignored).
    row_valid: [MAX_A] bool; col_valid: [MAX_B] bool.
    cost_limit: scalar — lapjv cost_limit semantics as described above.
    """
    cost = cost.astype(jnp.float32)
    cost_limit = jnp.asarray(cost_limit, dtype=jnp.float32)
    # Feasibility pre-parking: a row (column) whose every valid entry
    # exceeds cost_limit is unmatched in EVERY optimal solution of the
    # extended square problem — if it took a real partner at cost
    # c > L, rerouting both endpoints through the dummy region (L/2
    # each, dummy-dummy 0) saves c - L > 0. Such rows/cols therefore
    # behave exactly like invalid slots and are parked before the
    # solver runs, so no augmentation (one sequential Dijkstra each)
    # is spent on them. This is the dominant real-world case for the
    # cascade's passes (lost tracks far from every detection, low/high
    # score bands with no overlap) and turns the all-infeasible frame
    # into a no-op solve. Exactness: strict '>', so a pair at exactly
    # the limit stays live (ties there are already documented as
    # resolve-either-way); validated by the scipy-oracle fuzz in
    # tests/test_assignment.py and on device by bench.py's preamble.
    valid_pair = row_valid[:, None] & col_valid[None, :]
    feasible = valid_pair & (cost <= cost_limit)
    row_valid = row_valid & jnp.any(feasible, axis=1)
    col_valid = col_valid & jnp.any(feasible, axis=0)
    # No degenerate-skip cond: on this platform a lax.cond costs close
    # to its untaken branch's execution anyway (docs/PERF.md
    # "Conditionals" — with the XLA while-loop solver in the skipped
    # branch an empty frame measured ~8 ms/pass SLOWER than just
    # running it). A fully-parked instance (one side empty — the
    # cascade's pass 2/3 on most frames) has zero live rows, so the
    # augmentation loop exits immediately and the solver itself IS the
    # fast path: everything stays pre-matched to dummies and every real
    # endpoint extracts as unmatched, identical to lap's size-0 return
    # (demo:1683-1684; tests/test_assignment.py degenerate cases).
    return _solve_masked_nonempty(cost, row_valid, col_valid,
                                  cost_limit, max_iters)


def _solve_masked_nonempty(
    cost: jnp.ndarray,
    row_valid: jnp.ndarray,
    col_valid: jnp.ndarray,
    cost_limit: jnp.ndarray,
    max_iters: int,
) -> AssignmentResult:
    max_a, max_b = cost.shape
    s = max_a + max_b

    finite_max = jnp.max(jnp.where(
        row_valid[:, None] & col_valid[None, :], jnp.abs(cost), 0.0))
    big = finite_max + jnp.abs(cost_limit) + 1.0

    half = cost_limit / 2.0
    ext = jnp.full((s, s), half, dtype=jnp.float32)
    # Real-real block: true costs on valid pairs, BIG on invalid so a
    # valid endpoint always prefers its dummy option over a padding slot.
    rr = jnp.where(row_valid[:, None] & col_valid[None, :], cost, big)
    ext = ext.at[:max_a, :max_b].set(rr)
    # Invalid real rows pair with dummy columns at 0 cost, and invalid real
    # cols with dummy rows: padding slots behave like extra dummy-dummy
    # pairs and never perturb the valid sub-problem.
    row_idx = jnp.arange(s)[:, None]
    col_idx = jnp.arange(s)[None, :]
    inv_row_ext = jnp.concatenate(
        [jnp.logical_not(row_valid), jnp.zeros((max_b,), dtype=bool)])
    inv_col_ext = jnp.concatenate(
        [jnp.logical_not(col_valid), jnp.zeros((max_a,), dtype=bool)])
    ext = jnp.where(inv_row_ext[:, None] & (col_idx >= max_b), 0.0, ext)
    ext = jnp.where((row_idx >= max_a) & inv_col_ext[None, :], 0.0, ext)
    # Dummy-dummy block is 0 (lap: cost_c_extended[n:, m:] = 0).
    ext = jnp.where((row_idx >= max_a) & (col_idx >= max_b), 0.0, ext)

    # Designated parking: padding slots have all-equal options, so they
    # are PRE-MATCHED before the solver runs — real row i to its
    # dedicated dummy column max_b+i (cost 0 for invalid rows), and dummy
    # row max_a+j to column j when j is an invalid column. Pre-matches
    # at zero potentials satisfy complementary slackness (their reduced
    # costs are 0 and all ext entries are >= 0), so the solver only
    # augments for live rows.
    rows_a = jnp.arange(max_a)
    parked = jnp.concatenate([
        jnp.logical_not(row_valid),
        jnp.logical_not(col_valid),
    ])
    parked_col = jnp.concatenate([
        max_b + rows_a, jnp.arange(max_b)]).astype(jnp.int32)
    use_pallas = (
        jax.default_backend() == "tpu"
        and os.environ.get("BOTSORT_TPU_PALLAS_LAP", "1") == "1"
    )
    if use_pallas:
        # Fused Pallas kernel: same algorithm, all state in VMEM, no
        # per-op issue overhead inside the Dijkstra loop (2-13x faster
        # than the XLA formulation; BOTSORT_TPU_PALLAS_LAP=0 disables).
        from botsort_tpu.ops.assignment_pallas import jv_solve_pallas

        owner = jv_solve_pallas(ext, parked, parked_col,
                                min(max_iters, 4096))
    else:
        owner = _jv_masked(ext, parked, parked_col, max_iters)

    # owner[j] = row assigned to column j in the square problem.
    cols = jnp.arange(s)
    owner_clamped = jnp.clip(owner, 0, max_a - 1)
    real_match = (
        (owner >= 0)
        & (owner < max_a)
        & (cols < max_b)
        & row_valid[owner_clamped]
        & jnp.concatenate([col_valid, jnp.zeros((max_a,), dtype=bool)])
    )
    row_for_col = jnp.where(
        real_match[:max_b], owner[:max_b], -1).astype(jnp.int32)
    safe_rows = jnp.where(row_for_col >= 0, row_for_col, max_a)
    col_for_row = (
        jnp.full((max_a + 1,), -1, dtype=jnp.int32)
        .at[safe_rows]
        .set(jnp.arange(max_b, dtype=jnp.int32))[:max_a]
    )
    return AssignmentResult(col_for_row=col_for_row, row_for_col=row_for_col)


@partial(jax.jit, static_argnames=("limits", "max_iters"))
def solve_cascade_masked(
    dists1: jnp.ndarray,
    iou_d: jnp.ndarray,
    dists3: jnp.ndarray,
    pool_m: jnp.ndarray,
    tracked_m: jnp.ndarray,
    unconf_m: jnp.ndarray,
    high_m: jnp.ndarray,
    low_m: jnp.ndarray,
    limits: tuple,
    max_iters: int = 20000,
):
    """The association cascade's three chained thresholded LAPs.

    Pass 1: pool_m x high_m over dists1 (limit limits[0]).
    Pass 2: (tracked_m & pass-1-row-unmatched) x low_m over iou_d.
    Pass 3: unconf_m x (high_m & pass-1-col-unmatched) over dists3.
    Returns (res1, res2, res3) AssignmentResults.

    On TPU this is ONE Pallas launch (assignment_pallas.
    cascade_solve_pallas) with infeasible rows/cols pre-parked per pass
    (docs/PERF.md "The garbage-detection solver load": an endpoint with
    no entry <= the pass limit is unmatched in every optimal solution,
    so it costs zero augmentations). Elsewhere (CPU tests,
    BOTSORT_TPU_PALLAS_LAP=0) it composes three solve_masked calls —
    the semantics oracle the kernel is tested against
    (tests/test_cascade_solve.py) — which pre-park identically.
    """
    use_pallas = (
        jax.default_backend() == "tpu"
        and os.environ.get("BOTSORT_TPU_PALLAS_LAP", "1") == "1"
    )
    if use_pallas:
        from botsort_tpu.ops.assignment_pallas import cascade_solve_pallas

        out = cascade_solve_pallas(
            dists1.astype(jnp.float32), iou_d.astype(jnp.float32),
            dists3.astype(jnp.float32), pool_m, tracked_m, unconf_m,
            high_m, low_m, tuple(float(x) for x in limits),
            min(max_iters, 4096))
        return tuple(AssignmentResult(cfr, rfc) for cfr, rfc in out)
    res1 = solve_masked(dists1, pool_m, high_m, limits[0], max_iters)
    rv2 = tracked_m & (res1.col_for_row < 0)
    res2 = solve_masked(iou_d, rv2, low_m, limits[1], max_iters)
    leftover = high_m & (res1.row_for_col < 0)
    res3 = solve_masked(dists3, unconf_m, leftover, limits[2], max_iters)
    return res1, res2, res3
