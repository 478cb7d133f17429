"""Pallas TPU kernel for the Jonker-Volgenant assignment solver.

The XLA formulation (ops/assignment.py) is algorithmically right but pays
a few microseconds of per-op issue overhead inside every Dijkstra pop
(~14 small vector ops per pop -> ~40us/pop). This kernel runs the ENTIRE
solve — augmentations, potential updates, path unwinding — as one Pallas
program, so a pop costs a handful of back-to-back VPU ops. Same
algorithm, same results (validated against the XLA solver and the scipy
oracle in tests/test_assignment.py).

Batching: the kernel is natively batched over a leading grid dimension
(one grid step per problem instance; scratch reused across steps), and
``jv_solve_pallas`` carries a ``custom_vmap`` rule that routes
``jax.vmap`` (e.g. the multi-stream cascade in frame_step_batched) to
that grid instead of pallas's default batching, which produces SMEM
block shapes Mosaic cannot lower.

Mosaic notes: all vector state (potentials, Dijkstra labels, matching)
lives in VMEM scratch refs — loops carry only scalars, sidestepping
layout inference on loop-carried vectors; every vector is 2-D (1, S);
scalar extraction from vectors uses masked sums; the square problem is
padded to a multiple of 128 lanes with pre-matched pad pairs.

The extended square problem is at most a few hundred wide, so everything
(ext [S,S] f32 plus a handful of [1,S] vectors) fits comfortably in VMEM.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30  # plain float: Pallas kernels cannot capture array constants


def _lockstep_enabled() -> bool:
    """vmap over streams routes to the lockstep kernel unless
    BOTSORT_LOCKSTEP=0 (A/B escape hatch; the grid path remains the
    single-instance implementation either way)."""
    return os.environ.get("BOTSORT_LOCKSTEP", "1") != "0"


def _jv_kernel(ext_ref, p0_ref, live_order_ref, n_live_ref, p_ref,
               minv_ref, way_ref, used_ref, onpath_ref, u_ref, v_ref,
               max_iters: int):
    b = pl.program_id(0)
    s = ext_ref.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)        # (1, S)

    def scalar_at_i(ref, j):
        # ref: (1, S) int vector ref; -> ref[0, j] via masked sum.
        return jnp.sum(jnp.where(idx == j, ref[:, :], 0)).astype(jnp.int32)

    u_ref[:, :] = jnp.zeros((1, s), jnp.float32)
    v_ref[:, :] = jnp.zeros((1, s), jnp.float32)
    p_ref[:, :] = p0_ref[:, :]
    n_live = n_live_ref[b, 0]

    def outer_body(k):
        i = live_order_ref[b, k]

        minv_ref[:, :] = jnp.full((1, s), _INF, jnp.float32)
        way_ref[:, :] = jnp.full((1, s), s, jnp.int32)
        used_ref[:, :] = jnp.zeros((1, s), jnp.int32)
        onpath_ref[:, :] = jnp.zeros((1, s), jnp.int32)

        def pop_cond(pst):
            return jnp.logical_and(pst[2] == 0, pst[3] < max_iters)

        def pop_body(pst):
            cur_row, j_from, done, it = pst
            onpath_ref[:, :] = jnp.where(idx == cur_row, 1,
                                         onpath_ref[:, :])
            used = used_ref[:, :]
            ext_row = ext_ref[pl.ds(cur_row, 1), :]              # (1, S)
            u_cur = jnp.sum(jnp.where(idx == cur_row, u_ref[:, :], 0.0))
            reduced = ext_row - u_cur - v_ref[:, :]
            minv = minv_ref[:, :]
            upd = (used == 0) & (reduced < minv)
            minv = jnp.where(upd, reduced, minv)
            way_ref[:, :] = jnp.where(upd, j_from, way_ref[:, :])
            masked = jnp.where(used == 1, _INF, minv)
            delta = jnp.min(masked)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            u_ref[:, :] = jnp.where(onpath_ref[:, :] == 1,
                                    u_ref[:, :] + delta, u_ref[:, :])
            v_ref[:, :] = jnp.where(used == 1, v_ref[:, :] - delta,
                                    v_ref[:, :])
            minv_ref[:, :] = jnp.where(used == 1, minv, minv - delta)
            used_ref[:, :] = jnp.where(idx == j1, 1, used)
            nxt_row = scalar_at_i(p_ref, j1)
            done = jnp.where(nxt_row < 0, 1, 0).astype(jnp.int32)
            cur_row = jnp.where(nxt_row < 0, cur_row, nxt_row)
            return (cur_row, j1, done, it + 1)

        _, j_end, _, _ = jax.lax.while_loop(
            pop_cond, pop_body,
            (i, jnp.int32(s), jnp.int32(0), jnp.int32(0)))

        def unwind_cond(ust):
            return jnp.logical_and(ust[0] < s, ust[1] < max_iters)

        def unwind_body(ust):
            j0, it = ust
            j1 = scalar_at_i(way_ref, j0)
            row = jnp.where(j1 >= s, i, scalar_at_i(p_ref, j1))
            p_ref[:, :] = jnp.where(idx == j0, row, p_ref[:, :])
            return j1, it + 1

        jax.lax.while_loop(unwind_cond, unwind_body,
                           (j_end, jnp.int32(0)))
        return k + 1

    jax.lax.while_loop(lambda k: k < n_live, outer_body, jnp.int32(0))


def _jv_call_batched(ext, p0, live_order, n_live, max_iters: int,
                     interpret: bool):
    """One grid step per problem: ext [B,S,S], p0 [B,1,S],
    live_order [B,S], n_live [B,1] -> owner [B,1,S]."""
    bsz, sp = ext.shape[0], ext.shape[1]
    return pl.pallas_call(
        functools.partial(_jv_kernel, max_iters=max_iters),
        grid=(bsz,),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, sp), jnp.int32),
        in_specs=[
            pl.BlockSpec((None, sp, sp), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, 1, sp), lambda b: (b, 0, 0)),
            # Scalar-prefetch style inputs: full arrays in SMEM, indexed
            # by program_id inside the kernel (blocked SMEM specs with a
            # unit leading block don't lower on Mosaic).
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, sp), lambda b: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, sp), jnp.float32),   # minv
            pltpu.VMEM((1, sp), jnp.int32),     # way
            pltpu.VMEM((1, sp), jnp.int32),     # used
            pltpu.VMEM((1, sp), jnp.int32),     # on_path
            pltpu.VMEM((1, sp), jnp.float32),   # u
            pltpu.VMEM((1, sp), jnp.float32),   # v
        ],
        interpret=interpret,
    )(ext, p0, live_order, n_live)


@functools.lru_cache(maxsize=None)
def _get_jv_call(max_iters: int, interpret: bool):
    """custom_vmap wrapper: a single solve runs as a 1-step grid; a
    vmapped solve (multi-stream cascade) runs as a B-step grid in ONE
    kernel — never pallas's default batching rule."""

    @jax.custom_batching.custom_vmap
    def jv_call(ext, p0, live_order, n_live):
        return _jv_call_batched(
            ext[None], p0[None], live_order[None], n_live[None],
            max_iters, interpret)[0]

    @jv_call.def_vmap
    def _jv_call_vmap(axis_size, in_batched, ext, p0, live_order, n_live):
        args = [
            x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
            for x, b in zip((ext, p0, live_order, n_live), in_batched)
        ]
        return _jv_call_batched(*args, max_iters, interpret), True

    return jv_call


def _shift_lanes(x, s: int):
    """y[b, l] = x[b, l - s] (zeros shifted in); s static.

    Lowered as a permutation matmul rather than pad+concat: Mosaic's
    tpu.concatenate rejects inputs whose vector layout carries a
    nonzero offset ("result/input offset mismatch on non-concat
    dimension"), which is exactly what keepdims-reduction outputs
    (win_col etc. in the round-5 column reduction) arrive with. The
    matmul form is layout-agnostic and exact for the 0/1 int masks
    this helper shifts (values fit f32); one (B,sp)x(sp,sp) dot per
    call, negligible at sp<=256.
    """
    if s == 0:
        return x
    sp = x.shape[1]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    perm = (row_i + s == lane_i).astype(jnp.float32)
    y = jnp.dot(x.astype(jnp.float32), perm,
                preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def _post_reduction_resolve(cost2d, v_lane, live_cell, rv, cv, rv_shift,
                            cv_shift, q_in, p_in, plive_in, half, idx,
                            row_iota, lane_iota, diag, tri):
    """Two exact vectorized resolution steps run AFTER the column
    reduction and BEFORE the sequential Dijkstra augmentation phase.
    Shared by both cascade kernels (identical math + tie-breaks so the
    grid/lockstep equality tests keep holding). All inputs/outputs are
    traced values, not refs; (1, sp) lane vectors and (sp, sp) tiles.

    (a) Escape fast-path: a live real row whose minimum reduced cost
        over live columns is >= half (the dummy-column opt-out price)
        will take SOME escape column in every optimal solution the
        duals can certify right now: set u[i] = half (feasible, since
        every entry of its extended row minus v is >= half) and
        rank-pair such rows with the still-free escape columns at
        reduced cost half - u - 0 = 0. Counting argument for enough
        escapes: #free escapes = #live real rows - #column-reduction
        wins - #pair-1-consumed, and qualified rows are a subset of
        the non-winning live rows.
    (b) Free-column claim (2 rounds): an unassigned live row whose
        GLOBAL minimum reduced cost is attained at a still-free live
        column can take it immediately with u[i] = that minimum —
        dual-feasible by construction, reduced cost 0 at the claimed
        pair (complementary slackness), no displacement needed.
        Lowest row index wins a contested column; losers retry next
        round against the shrunken free set.
    (c) Dummy-row completion: live dummy rows whose column the
        reduction left UNWON (so pairing step 2 of the init skipped
        them) rank-pair with the remaining free escape columns at
        u = 0 — a dummy row's extended costs are all >= 0 under any
        v <= half, and the escape pair costs exactly 0, so feasibility
        and CS hold. Escape identity never reaches the outputs (any
        q >= n_cols extracts as unmatched; plive covers real columns
        only), and the row's REAL column stays free for later claims.
        Without this, each such row burns a full delta-zero Dijkstra
        walk over the owned escapes — ~26 pops apiece in the
        degenerate-features bench regime (docs/PERF.md), where unwon
        claim_live columns leave ~48 of these per pass. Excess rows
        beyond the free-escape count (ranks past the provider list)
        simply stay active and augment as before.

    Both steps keep duals feasible and every assigned pair at reduced
    cost 0, so the remaining augmentation phase stays EXACT — it
    simply starts from a more complete matching. On the adversarial
    random-feature regime (the bench headline scene) step (a) resolves
    nearly every row that pre-parking's any()-feasibility test could
    not (rows with a few sub-limit entries that still all exceed
    half after the column reduction's v), collapsing the sequential
    pop count.
    """
    sp = cost2d.shape[0]

    def to_lanes_i(col_vec):
        return jnp.sum(
            jnp.where(diag, jnp.broadcast_to(col_vec, (sp, sp)), 0),
            axis=0, keepdims=True)

    def to_lanes_f(col_vec):
        return jnp.sum(
            jnp.where(diag, jnp.broadcast_to(col_vec, (sp, sp)), 0.0),
            axis=0, keepdims=True)

    def to_rows_i(lane_vec):
        return jnp.sum(
            jnp.where(diag, jnp.broadcast_to(lane_vec, (sp, sp)), 0),
            axis=1, keepdims=True)

    reduced2d = cost2d - jnp.broadcast_to(v_lane, (sp, sp))
    red_live = jnp.where(live_cell, reduced2d, _INF)
    rowmin_live = jnp.min(red_live, axis=1, keepdims=True)    # (sp, 1)

    q_cur, p_cur, plive_cur = q_in, p_in, plive_in
    u_lane = jnp.zeros_like(v_lane)

    # --- (a) escape fast-path.
    act_l = jnp.where(jnp.logical_and(rv == 1, q_cur < 0), 1, 0)
    qual_r = jnp.where(
        jnp.logical_and(to_rows_i(act_l) == 1, rowmin_live >= half),
        1, 0)                                                 # (sp, 1)
    qual_l = to_lanes_i(qual_r)
    esc_free = jnp.where(jnp.logical_and(rv_shift == 1, p_cur < 0),
                         1, 0)
    rank_c = jnp.dot(qual_l.astype(jnp.float32), tri,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    rank_e = jnp.dot(esc_free.astype(jnp.float32), tri,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    pair2 = ((to_rows_i(rank_c) == rank_e)
             & (to_rows_i(qual_l) == 1)
             & jnp.broadcast_to(esc_free == 1, (sp, sp)))
    qp2 = to_lanes_i(jnp.min(jnp.where(pair2, lane_iota, sp),
                             axis=1, keepdims=True))          # (1, sp)
    pp2 = jnp.min(jnp.where(pair2, row_iota, sp),
                  axis=0, keepdims=True)                      # (1, sp)
    took = jnp.logical_and(qual_l == 1, qp2 < sp)
    q_cur = jnp.where(took, qp2, q_cur)
    p_cur = jnp.where(jnp.logical_and(esc_free == 1, pp2 < sp),
                      pp2, p_cur)
    u_lane = jnp.where(took, half, u_lane)

    # --- (b) free-column claim rounds.
    for _ in range(2):
        act_l = jnp.where(jnp.logical_and(rv == 1, q_cur < 0), 1, 0)
        act_r = to_rows_i(act_l)
        freecol = jnp.where(jnp.logical_and(cv == 1, p_cur < 0), 1, 0)
        red_free = jnp.where(
            live_cell & jnp.broadcast_to(freecol == 1, (sp, sp)),
            reduced2d, _INF)
        freemin_r = jnp.min(red_free, axis=1, keepdims=True)  # (sp, 1)
        ok_r = ((act_r == 1) & (freemin_r <= rowmin_live)
                & (freemin_r <= half))
        argj_r = jnp.min(jnp.where(red_free == freemin_r, lane_iota, sp),
                         axis=1, keepdims=True)               # (sp, 1)
        claim2d = ((lane_iota == argj_r)
                   & jnp.broadcast_to(ok_r, (sp, sp)))
        winrow_c = jnp.min(jnp.where(claim2d, row_iota, sp),
                           axis=0, keepdims=True)             # (1, sp)
        win2 = claim2d & (row_iota == winrow_c)
        wrow_r = jnp.max(win2.astype(jnp.int32), axis=1,
                         keepdims=True)                       # (sp, 1)
        jwin_r = jnp.min(jnp.where(win2, lane_iota, sp),
                         axis=1, keepdims=True)               # (sp, 1)
        wcol_l = jnp.max(win2.astype(jnp.int32), axis=0,
                         keepdims=True)                       # (1, sp)
        won_l = to_lanes_i(wrow_r) == 1
        q_cur = jnp.where(won_l, to_lanes_i(jwin_r), q_cur)
        p_cur = jnp.where(wcol_l == 1, winrow_c, p_cur)
        u_lane = jnp.where(
            won_l,
            to_lanes_f(jnp.where(wrow_r == 1, rowmin_live, 0.0)),
            u_lane)
        plive_cur = jnp.where(wcol_l == 1, 1, plive_cur)

    # --- (c) dummy-row completion.
    dum_l = jnp.where(jnp.logical_and(cv_shift == 1, q_cur < 0), 1, 0)
    esc2 = jnp.where(jnp.logical_and(rv_shift == 1, p_cur < 0), 1, 0)
    rank_d = jnp.dot(dum_l.astype(jnp.float32), tri,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    rank_f = jnp.dot(esc2.astype(jnp.float32), tri,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    pair3 = ((to_rows_i(rank_d) == rank_f)
             & (to_rows_i(dum_l) == 1)
             & jnp.broadcast_to(esc2 == 1, (sp, sp)))
    qp3 = to_lanes_i(jnp.min(jnp.where(pair3, lane_iota, sp),
                             axis=1, keepdims=True))
    pp3 = jnp.min(jnp.where(pair3, row_iota, sp),
                  axis=0, keepdims=True)
    q_cur = jnp.where(jnp.logical_and(dum_l == 1, qp3 < sp), qp3, q_cur)
    p_cur = jnp.where(jnp.logical_and(esc2 == 1, pp3 < sp), pp3, p_cur)
    return q_cur, p_cur, u_lane, plive_cur


def _cascade_kernel(cost_ref, pool_ref, tracked_ref, unconf_ref,
                    high1_ref, high3_ref, low_ref, big_ref,
                    p_out, q_out, plive_out,
                    minv_ref, way_ref, used_ref, onpath_ref, u_ref, v_ref,
                    *, n_rows: int, n_cols: int, limits, max_iters: int):
    """The association cascade's THREE chained JV solves in ONE kernel.

    Runs pass 1 (pool x high, fused costs), derives the pass-2/3
    row/column masks from pass 1's matching IN-KERNEL, and runs passes
    2 (unmatched-tracked x low, IoU) and 3 (unconfirmed x leftover-high)
    back to back — one launch. (Round 2 justified the fusion with a
    "~1.8 ms per launch with store-derived inputs" measurement that
    round 3 traced to garbage-detection solver load — docs/PERF.md
    "The garbage-detection solver load"; one launch remains the right
    structure, and the caller pre-parks infeasible endpoints via the
    high1/high3/low/pool/tracked/unconf masks so all-infeasible frames
    cost no augmentations at all.)

    Differences from _jv_kernel: the extended square matrix is never
    materialized — each Dijkstra pop builds its ext ROW on the fly from
    the pass's cost matrix, the row's class (live/parked/dummy/pad) and
    the column masks; the matching is tracked from both sides (p: owner
    row per column, q: column per row, plive: column owned by a LIVE
    row) so pass-2/3 masks and the host-side extraction need no gathers.
    """
    b = pl.program_id(0)
    sp = pool_ref.shape[1]
    s_total = n_rows + n_cols
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, sp), 1)

    def scalar_at(vec, j):
        return jnp.sum(jnp.where(idx == j, vec, 0)).astype(jnp.int32)

    def scalar_at_f(vec, j):
        return jnp.sum(jnp.where(idx == j, vec, 0.0))

    big = big_ref[b, 0]
    lane_real_col = (idx < n_cols).astype(jnp.int32)
    lane_real_row = (idx < n_rows).astype(jnp.int32)
    lane_in_s = (idx < s_total).astype(jnp.int32)

    for pass_i in range(3):
        half = limits[pass_i] / 2.0
        if pass_i == 0:
            rv = pool_ref[:, :] * lane_real_row
            cv = high1_ref[:, :] * lane_real_col
        elif pass_i == 1:
            q1 = q_out[0, :, :]
            unmatched1 = jnp.where(q1 >= n_cols, 1, 0)
            rv = tracked_ref[:, :] * unmatched1 * lane_real_row
            cv = low_ref[:, :] * lane_real_col
        else:
            plive1 = plive_out[0, :, :]
            rv = unconf_ref[:, :] * lane_real_row
            cv = high3_ref[:, :] * (1 - plive1) * lane_real_col
        rv_shift = _shift_lanes(rv, n_cols)   # rv[l - D] at lane l
        cv_shift = _shift_lanes(cv, n_rows)   # cv[l - N] at lane l
        # Live rows of the SQUARE problem: valid real rows AND the
        # dummy rows of valid columns — the latter must be augmented
        # too (they are how valid columns acquire their dummy opt-out;
        # without them the square matching is incomplete and the
        # matching of the real block is not optimal). Disjoint supports
        # so a plain sum forms the mask.
        live_vec = rv + cv_shift

        # Designated parking (see ops/assignment.py): invalid real col j
        # owned by dummy row N+j; invalid real row i owns dummy col D+i;
        # pad lanes pair diagonally.
        p_init = jnp.where(
            lane_real_col == 1,
            jnp.where(cv == 0, n_rows + idx, -1),
            jnp.where(lane_in_s == 1,
                      jnp.where(rv_shift == 0, idx - n_cols, -1),
                      idx))
        q_init = jnp.where(
            lane_real_row == 1,
            jnp.where(rv == 0, n_cols + idx, -1),
            jnp.where(lane_in_s == 1,
                      jnp.where(cv_shift == 0, idx - n_rows, -1),
                      idx))
        p_out[pass_i, :, :] = p_init
        q_out[pass_i, :, :] = q_init
        plive_out[pass_i, :, :] = jnp.zeros((1, sp), jnp.int32)
        u_ref[:, :] = jnp.zeros((1, sp), jnp.float32)
        v_ref[:, :] = jnp.zeros((1, sp), jnp.float32)

        # --- LAPJV-style column reduction (round 5). Pre-assign each
        # live column to its min-cost live row (or to its designated
        # dummy row when the half-limit opt-out is at least as cheap)
        # and start v at the column minima — the same initialization
        # real lap.lapjv performs before its augmentation phase. With
        # u = 0 and v[j] = the column's global row-minimum the duals
        # are feasible and every pre-assigned pair has reduced cost 0
        # (complementary slackness), so the Dijkstra phase below stays
        # exact: it simply augments only the rows the reduction left
        # unassigned. Tracking cost matrices are near-diagonal (each
        # track close to its detection), so this resolves almost every
        # row and collapses the sequential pop count — the
        # single-stream solver was ~1.0 of the 10.35 ms loaded frame
        # (tools/perf_probe.py --stages loadedtail; docs/PERF.md).
        cost2d = cost_ref[pass_i, :, :]                     # (sp, sp)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
        diag = row_iota == lane_iota
        # rv lives on lanes; transpose it to sublanes via the diagonal.
        rv_rows = jnp.sum(
            jnp.where(diag, jnp.broadcast_to(rv, (sp, sp)), 0),
            axis=1, keepdims=True)                          # (sp, 1)
        live_cell = (rv_rows == 1) & (cv == 1)
        cost_live = jnp.where(live_cell, cost2d, _INF)
        colmin = jnp.min(cost_live, axis=0, keepdims=True)  # (1, sp)
        # Lowest live row achieving the minimum (deterministic ties).
        rowarg = jnp.min(
            jnp.where(cost_live == colmin, row_iota, sp),
            axis=0, keepdims=True)                          # (1, sp)
        claim_live = (cv == 1) & (colmin < half)
        claim_dummy = (cv == 1) & jnp.logical_not(claim_live)
        # One column per row: each claimed row keeps its lowest column.
        claimed = (row_iota == rowarg) & jnp.broadcast_to(
            claim_live, (sp, sp))
        firstj = jnp.min(jnp.where(claimed, lane_iota, sp),
                         axis=1, keepdims=True)             # (sp, 1)
        win2d = claimed & (lane_iota == firstj)
        win_col = jnp.max(win2d.astype(jnp.int32), axis=0,
                          keepdims=True)                    # (1, sp)
        p_out[pass_i, :, :] = jnp.where(
            win_col == 1, rowarg,
            jnp.where(claim_dummy, n_rows + idx, p_init))
        win_row = jnp.max(win2d.astype(jnp.int32), axis=1,
                          keepdims=True)                    # (sp, 1)

        def to_lanes(col_vec):
            return jnp.sum(
                jnp.where(diag, jnp.broadcast_to(col_vec, (sp, sp)), 0),
                axis=0, keepdims=True)

        q_new = jnp.where(to_lanes(win_row) == 1, to_lanes(firstj),
                          q_init)
        # Dummy row n_rows+j claimed its own column j.
        q_new = jnp.where(
            _shift_lanes(claim_dummy.astype(jnp.int32), n_rows) == 1,
            idx - n_rows, q_new)
        v_ref[:, :] = jnp.where(cv == 1, jnp.minimum(colmin, half), 0.0)

        # Rank-pair the leftover live dummy rows (whose column a live
        # row won) with free dummy columns (live real rows' escape
        # slots): cost 0, v 0 — reduced cost 0, so complementary
        # slackness holds and augmenting paths can still reroute these
        # pairs later. #free escapes >= #leftover dummies (each win
        # consumed one live real row), so every dummy row resolves
        # here and the augmentation loop below runs ONLY for live real
        # rows that lost a reduction conflict. Ranks come from an
        # inclusive-cumsum as a triangular matmul (no cumsum primitive
        # in Mosaic).
        tri = (row_iota <= lane_iota).astype(jnp.float32)   # (sp, sp)
        rows_a = _shift_lanes(win_col, n_rows)          # dummy-row lanes
        cols_b = rv_shift                                # free escapes
        rank_a = jnp.dot(rows_a.astype(jnp.float32), tri,
                         preferred_element_type=jnp.float32
                         ).astype(jnp.int32)                # (1, sp)
        rank_b = jnp.dot(cols_b.astype(jnp.float32), tri,
                         preferred_element_type=jnp.float32
                         ).astype(jnp.int32)

        def to_rows(lane_vec):
            return jnp.sum(
                jnp.where(diag, jnp.broadcast_to(lane_vec, (sp, sp)), 0),
                axis=1, keepdims=True)

        pair_m = ((to_rows(rank_a) == rank_b)
                  & (to_rows(rows_a) == 1)
                  & jnp.broadcast_to(cols_b == 1, (sp, sp)))
        q_pair = to_lanes(jnp.min(jnp.where(pair_m, lane_iota, sp),
                                  axis=1, keepdims=True))   # (1, sp)
        p_pair = jnp.min(jnp.where(pair_m, row_iota, sp),
                         axis=0, keepdims=True)             # (1, sp)
        q_new = jnp.where((rows_a == 1) & (q_pair < sp), q_pair, q_new)
        q_out[pass_i, :, :] = q_new
        p_red = p_out[pass_i, :, :]
        p_out[pass_i, :, :] = jnp.where(
            (cols_b == 1) & (p_pair < sp), p_pair, p_red)
        plive_out[pass_i, :, :] = win_col

        # Escape fast-path + free-column claims (round-5 session 2;
        # see _post_reduction_resolve) — resolves most of the rows the
        # column reduction left active, so the sequential loop below
        # runs only for genuinely contested rows.
        q_res, p_res, u_lane, plive_res = _post_reduction_resolve(
            cost2d, v_ref[:, :], live_cell, rv, cv, rv_shift, cv_shift,
            q_out[pass_i, :, :], p_out[pass_i, :, :],
            plive_out[pass_i, :, :], half, idx,
            row_iota, lane_iota, diag, tri)
        q_out[pass_i, :, :] = q_res
        p_out[pass_i, :, :] = p_res
        plive_out[pass_i, :, :] = plive_res
        u_ref[:, :] = u_lane

        # Compacted augmentation order: order[k] = lane of the k-th
        # ACTIVE row (live, still unassigned) — the outer loop below
        # runs n_active iterations instead of s_total (the fori over
        # all 114 rows cost ~as much as the augmentations themselves;
        # docs/PERF.md round 5).
        q_vec = q_out[pass_i, :, :]
        active = jnp.where(live_vec == 1,
                           jnp.where(q_vec < 0, 1, 0), 0)   # (1, sp)
        rank_act = jnp.dot(active.astype(jnp.float32), tri,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.int32)
        order_m = ((row_iota == jnp.broadcast_to(rank_act - 1, (sp, sp)))
                   & jnp.broadcast_to(active == 1, (sp, sp)))
        order_lane = to_lanes(jnp.min(
            jnp.where(order_m, lane_iota, sp),
            axis=1, keepdims=True))                         # (1, sp)
        n_active = scalar_at(rank_act, sp - 1)

        def ext_row(r):
            """Extended-matrix row r, built on the fly (1, sp)."""
            r_clamped = jnp.minimum(r, n_rows - 1)
            cost_row = cost_ref[pass_i, pl.ds(r_clamped, 1), :]
            rv_r = scalar_at(rv, r)
            live_real = jnp.where(
                lane_real_col == 1,
                jnp.where(cv == 1, cost_row, big),
                jnp.where(lane_in_s == 1, half, 1e9))
            parked_real = jnp.where(
                lane_real_col == 1, big,
                jnp.where(lane_in_s == 1, 0.0, 1e9))
            dummy_row = jnp.where(
                lane_real_col == 1,
                jnp.where(cv == 1, half, 0.0),
                jnp.where(lane_in_s == 1, 0.0, 1e9))
            pad_row = jnp.where(idx == r, 0.0, 1e9)
            real = jnp.where(rv_r == 1, live_real, parked_real)
            in_s = jnp.where(r < n_rows, real, dummy_row)
            return jnp.where(r < s_total, in_s, pad_row)

        def outer(k, carry):
            # k-th ACTIVE row (live and left unassigned by the
            # reduction; rows never lose their column once matched, so
            # reduction/pairing assignments are final row-side).
            i0 = scalar_at(order_lane, k)
            minv_ref[:, :] = jnp.full((1, sp), _INF, jnp.float32)
            way_ref[:, :] = jnp.full((1, sp), sp, jnp.int32)
            used_ref[:, :] = jnp.zeros((1, sp), jnp.int32)
            onpath_ref[:, :] = jnp.zeros((1, sp), jnp.int32)

            def pop_cond(pst):
                return jnp.logical_and(pst[2] == 0, pst[3] < max_iters)

            def pop_body(pst):
                cur_row, j_from, done, it = pst
                onpath_ref[:, :] = jnp.where(idx == cur_row, 1,
                                             onpath_ref[:, :])
                used = used_ref[:, :]
                erow = ext_row(cur_row)
                u_cur = scalar_at_f(u_ref[:, :], cur_row)
                reduced = erow - u_cur - v_ref[:, :]
                minv = minv_ref[:, :]
                upd = (used == 0) & (reduced < minv)
                minv = jnp.where(upd, reduced, minv)
                way_ref[:, :] = jnp.where(upd, j_from, way_ref[:, :])
                masked = jnp.where(used == 1, _INF, minv)
                delta = jnp.min(masked)
                j1 = jnp.argmin(masked).astype(jnp.int32)
                u_ref[:, :] = jnp.where(onpath_ref[:, :] == 1,
                                        u_ref[:, :] + delta, u_ref[:, :])
                v_ref[:, :] = jnp.where(used == 1, v_ref[:, :] - delta,
                                        v_ref[:, :])
                minv_ref[:, :] = jnp.where(used == 1, minv, minv - delta)
                used_ref[:, :] = jnp.where(idx == j1, 1, used)
                nxt_row = scalar_at(p_out[pass_i, :, :], j1)
                done = jnp.where(nxt_row < 0, 1, 0).astype(jnp.int32)
                cur_row = jnp.where(nxt_row < 0, cur_row, nxt_row)
                return (cur_row, j1, done, it + 1)

            _, j_end, _, _ = jax.lax.while_loop(
                pop_cond, pop_body,
                (i0, jnp.int32(sp), jnp.int32(0), jnp.int32(0)))

            def unwind_cond(ust):
                return jnp.logical_and(ust[0] < sp, ust[1] < max_iters)

            def unwind_body(ust):
                j0, it = ust
                j1 = scalar_at(way_ref[:, :], j0)
                row = jnp.where(j1 >= sp, i0,
                                scalar_at(p_out[pass_i, :, :], j1))
                p_out[pass_i, :, :] = jnp.where(idx == j0, row,
                                                p_out[pass_i, :, :])
                q_out[pass_i, :, :] = jnp.where(idx == row, j0,
                                                q_out[pass_i, :, :])
                live = jnp.logical_and(row < n_rows,
                                       scalar_at(rv, row) == 1)
                plive_out[pass_i, :, :] = jnp.where(
                    idx == j0, jnp.where(live, 1, 0),
                    plive_out[pass_i, :, :])
                return j1, it + 1

            jax.lax.while_loop(
                unwind_cond, unwind_body, (j_end, jnp.int32(0)))
            return carry

        jax.lax.fori_loop(0, n_active, outer, jnp.int32(0))


def _cascade_kernel_ls(c0_ref, c1_ref, c2_ref, pool_ref, tracked_ref,
                       unconf_ref, high1_ref, high3_ref, low_ref, big_ref,
                       p_out, q_out, plive_out,
                       minv_ref, way_ref, used_ref, onpath_ref, u_ref,
                       v_ref, currow_ref, jfrom_ref, done_ref, jend_ref,
                       rowbuf_ref, order_ref,
                       *, n_streams: int, n_rows: int, n_cols: int,
                       limits, max_iters: int):
    """LOCKSTEP multi-stream cascade: all B streams advance one Dijkstra
    pop per sequential step on (B, sp) tiles.

    The grid version (_cascade_kernel) serializes streams: B grid steps,
    each a full 3-pass cascade of (1, sp) vector ops — 1/8 of the VPU's
    sublanes, and total pops = SUM over streams. Measured at the
    8-stream moderate-16 geometry that solver is 3.56 of the 3.76 ms
    batched cascade tail (tools/casc_probe.py; docs/PERF.md). Here every
    per-stream scalar of the pop (current row, j_from, done, augmenting
    column) becomes a lane-broadcast (B, sp) vector, every vector op
    covers all streams in one (8, 128) tile, and sequential pops become
    the MAX over streams instead of the sum. The only per-stream scalar
    work left is the B cost-row gathers per pop (dynamic-slice loads at
    each stream's current row — Mosaic supports scalar-indexed ds).

    Streams whose Dijkstra finished (or whose outer row is parked) are
    frozen by masking every store with the per-stream active mask; the
    outer row index is UNIFORM across streams (plain 0..s_total fori —
    parked rows cost ~nothing, measured 0.126 ms for a fully-parked
    8-stream problem).

    Same math, same results as _cascade_kernel (oracle-fuzzed in
    tests/test_assignment_pallas.py / test_cascade_solve.py).
    """
    sp = pool_ref.shape[1]
    s_total = n_rows + n_cols
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, sp), 1)     # (1, sp)
    big = big_ref[0, 0]
    cost_refs = (c0_ref, c1_ref, c2_ref)

    lane_real_col = (idx < n_cols).astype(jnp.int32)
    lane_real_row = (idx < n_rows).astype(jnp.int32)
    lane_in_s = (idx < s_total).astype(jnp.int32)

    def at_lanes(vec, pos):
        """vec, pos: (B, sp); pos lane-broadcast -> (B, 1) vec[b, pos[b]].
        pos == sp (or any out-of-range) yields 0."""
        return jnp.sum(jnp.where(idx == pos, vec, 0), axis=1,
                       keepdims=True)

    def at_lanes_f(vec, pos):
        return jnp.sum(jnp.where(idx == pos, vec, 0.0), axis=1,
                       keepdims=True)

    for pass_i in range(3):
        half = limits[pass_i] / 2.0
        cost_ref = cost_refs[pass_i]
        if pass_i == 0:
            rv = pool_ref[:, :] * lane_real_row
            cv = high1_ref[:, :] * lane_real_col
        elif pass_i == 1:
            q1 = q_out[0, :, :]
            unmatched1 = jnp.where(q1 >= n_cols, 1, 0)
            rv = tracked_ref[:, :] * unmatched1 * lane_real_row
            cv = low_ref[:, :] * lane_real_col
        else:
            plive1 = plive_out[0, :, :]
            rv = unconf_ref[:, :] * lane_real_row
            cv = high3_ref[:, :] * (1 - plive1) * lane_real_col
        rv_shift = _shift_lanes(rv, n_cols)
        cv_shift = _shift_lanes(cv, n_rows)
        live_vec = rv + cv_shift

        p_init = jnp.where(
            lane_real_col == 1,
            jnp.where(cv == 0, n_rows + idx, -1),
            jnp.where(lane_in_s == 1,
                      jnp.where(rv_shift == 0, idx - n_cols, -1),
                      idx))
        q_init = jnp.where(
            (idx < n_rows).astype(jnp.int32) == 1,
            jnp.where(rv == 0, n_cols + idx, -1),
            jnp.where(lane_in_s == 1,
                      jnp.where(cv_shift == 0, idx - n_rows, -1),
                      idx))
        p_out[pass_i, :, :] = p_init
        q_out[pass_i, :, :] = q_init
        plive_out[pass_i, :, :] = jnp.zeros((n_streams, sp), jnp.int32)
        u_ref[:, :] = jnp.zeros((n_streams, sp), jnp.float32)
        v_ref[:, :] = jnp.zeros((n_streams, sp), jnp.float32)

        # --- LAPJV-style column reduction, per stream — identical math
        # and tie-breaks to the grid kernel's (see _cascade_kernel; the
        # two are asserted matching in tests/test_cascade_solve.py).
        row_iota2 = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
        lane_iota2 = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
        diag2 = row_iota2 == lane_iota2

        def to_lanes(col_vec):
            return jnp.sum(
                jnp.where(diag2, jnp.broadcast_to(col_vec, (sp, sp)), 0),
                axis=0, keepdims=True)

        tri2 = (row_iota2 <= lane_iota2).astype(jnp.float32)

        def to_rows(lane_vec):
            return jnp.sum(
                jnp.where(diag2, jnp.broadcast_to(lane_vec, (sp, sp)), 0),
                axis=1, keepdims=True)

        max_act = jnp.int32(0)
        for b in range(n_streams):
            cost2d = cost_ref[b, :, :]                      # (sp, sp)
            rv_b, cv_b = rv[b:b + 1, :], cv[b:b + 1, :]
            rv_rows = to_rows(rv_b)
            live_cell = (rv_rows == 1) & (cv_b == 1)
            cost_live = jnp.where(live_cell, cost2d, _INF)
            colmin = jnp.min(cost_live, axis=0, keepdims=True)
            rowarg = jnp.min(
                jnp.where(cost_live == colmin, row_iota2, sp),
                axis=0, keepdims=True)
            claim_live = (cv_b == 1) & (colmin < half)
            claim_dummy = (cv_b == 1) & jnp.logical_not(claim_live)
            claimed = (row_iota2 == rowarg) & jnp.broadcast_to(
                claim_live, (sp, sp))
            firstj = jnp.min(jnp.where(claimed, lane_iota2, sp),
                             axis=1, keepdims=True)
            win2d = claimed & (lane_iota2 == firstj)
            win_col = jnp.max(win2d.astype(jnp.int32), axis=0,
                              keepdims=True)
            win_row = jnp.max(win2d.astype(jnp.int32), axis=1,
                              keepdims=True)
            q_new = jnp.where(to_lanes(win_row) == 1, to_lanes(firstj),
                              q_init[b:b + 1, :])
            q_new = jnp.where(
                _shift_lanes(claim_dummy.astype(jnp.int32), n_rows) == 1,
                idx - n_rows, q_new)
            v_ref[b:b + 1, :] = jnp.where(
                cv_b == 1, jnp.minimum(colmin, half), 0.0)

            # Rank-pair leftover live dummy rows with free escape
            # columns (see _cascade_kernel for the invariants).
            rows_a = _shift_lanes(win_col, n_rows)
            cols_b = rv_shift[b:b + 1, :]
            rank_a = jnp.dot(rows_a.astype(jnp.float32), tri2,
                             preferred_element_type=jnp.float32
                             ).astype(jnp.int32)
            rank_b = jnp.dot(cols_b.astype(jnp.float32), tri2,
                             preferred_element_type=jnp.float32
                             ).astype(jnp.int32)
            pair_m = ((to_rows(rank_a) == rank_b)
                      & (to_rows(rows_a) == 1)
                      & jnp.broadcast_to(cols_b == 1, (sp, sp)))
            q_pair = to_lanes(jnp.min(jnp.where(pair_m, lane_iota2, sp),
                                      axis=1, keepdims=True))
            p_pair = jnp.min(jnp.where(pair_m, row_iota2, sp),
                             axis=0, keepdims=True)
            q_new = jnp.where((rows_a == 1) & (q_pair < sp), q_pair,
                              q_new)
            q_out[pass_i, b:b + 1, :] = q_new
            p_red = jnp.where(
                win_col == 1, rowarg,
                jnp.where(claim_dummy, n_rows + idx, p_init[b:b + 1, :]))
            p_out[pass_i, b:b + 1, :] = jnp.where(
                (cols_b == 1) & (p_pair < sp), p_pair, p_red)
            plive_out[pass_i, b:b + 1, :] = win_col

            # Escape fast-path + free-column claims — identical math
            # and tie-breaks to the grid kernel's (grid/lockstep
            # equality asserted in tests/test_cascade_solve.py).
            q_res, p_res, u_lane, plive_res = _post_reduction_resolve(
                cost2d, v_ref[b:b + 1, :], live_cell, rv_b, cv_b,
                cols_b, cv_shift[b:b + 1, :],
                q_out[pass_i, b:b + 1, :],
                p_out[pass_i, b:b + 1, :],
                plive_out[pass_i, b:b + 1, :], half, idx,
                row_iota2, lane_iota2, diag2, tri2)
            q_out[pass_i, b:b + 1, :] = q_res
            p_out[pass_i, b:b + 1, :] = p_res
            plive_out[pass_i, b:b + 1, :] = plive_res
            u_ref[b:b + 1, :] = u_lane

            # Compacted per-stream augmentation order (sentinel sp).
            live_b = live_vec[b:b + 1, :]
            active = jnp.where(live_b == 1,
                               jnp.where(q_res < 0, 1, 0), 0)
            rank_act = jnp.dot(active.astype(jnp.float32), tri2,
                               preferred_element_type=jnp.float32
                               ).astype(jnp.int32)
            order_m = ((row_iota2 == jnp.broadcast_to(rank_act - 1,
                                                      (sp, sp)))
                       & jnp.broadcast_to(active == 1, (sp, sp)))
            order_ref[b:b + 1, :] = to_lanes(jnp.min(
                jnp.where(order_m, lane_iota2, sp),
                axis=1, keepdims=True))
            n_act_b = jnp.sum(jnp.where(idx == sp - 1, rank_act, 0)
                              ).astype(jnp.int32)
            max_act = jnp.maximum(max_act, n_act_b)

        def outer(k, carry):
            # Each stream augments ITS k-th active row (streams are
            # independent problems, so per-stream augmentation order —
            # still increasing lane order — is all that matters for
            # grid-kernel equality). Sentinel sp = stream exhausted.
            k_vec = jnp.zeros((n_streams, sp), jnp.int32) + k
            cur0 = at_lanes(order_ref[:, :], k_vec)          # (B,1)
            rv_i = jnp.where(cur0 < sp, 1, 0).astype(jnp.int32)
            minv_ref[:, :] = jnp.full((n_streams, sp), _INF, jnp.float32)
            way_ref[:, :] = jnp.full((n_streams, sp), sp, jnp.int32)
            used_ref[:, :] = jnp.zeros((n_streams, sp), jnp.int32)
            onpath_ref[:, :] = jnp.zeros((n_streams, sp), jnp.int32)
            currow_ref[:, :] = jnp.broadcast_to(cur0, (n_streams, sp))
            jfrom_ref[:, :] = jnp.full((n_streams, sp), sp, jnp.int32)
            done_ref[:, :] = jnp.broadcast_to(1 - rv_i, (n_streams, sp))
            jend_ref[:, :] = jnp.full((n_streams, sp), sp, jnp.int32)
            n_done0 = jnp.sum(jnp.where(idx == 0, done_ref[:, :], 0))

            def pop_cond(pst):
                return jnp.logical_and(pst[1] < n_streams,
                                       pst[0] < max_iters)

            def pop_body(pst):
                it, _ = pst
                currow = currow_ref[:, :]
                a = 1 - done_ref[:, :]
                onpath_ref[:, :] = jnp.where(
                    (idx == currow) & (a == 1), 1, onpath_ref[:, :])
                # Per-stream cost-row gather (the one scalar-indexed
                # piece of the pop).
                for b in range(n_streams):
                    r_b = jnp.sum(currow_ref[b:b + 1, 0:1]).astype(
                        jnp.int32)
                    r_c = jnp.clip(r_b, 0, n_rows - 1)
                    rowbuf_ref[b:b + 1, :] = cost_ref[b, pl.ds(r_c, 1), :]
                rowbuf = rowbuf_ref[:, :]
                rv_r = at_lanes(rv, currow)                     # (B,1)
                live_real = jnp.where(
                    lane_real_col == 1,
                    jnp.where(cv == 1, rowbuf, big),
                    jnp.where(lane_in_s == 1, half, 1e9))
                parked_real = jnp.where(
                    lane_real_col == 1, big,
                    jnp.where(lane_in_s == 1, 0.0, 1e9))
                dummy_row = jnp.where(
                    lane_real_col == 1,
                    jnp.where(cv == 1, half, 0.0),
                    jnp.where(lane_in_s == 1, 0.0, 1e9))
                pad_row = jnp.where(idx == currow, 0.0, 1e9)
                real = jnp.where(rv_r == 1, live_real, parked_real)
                in_s = jnp.where(currow < n_rows, real, dummy_row)
                erow = jnp.where(currow < s_total, in_s, pad_row)

                used = used_ref[:, :]
                u_cur = at_lanes_f(u_ref[:, :], currow)         # (B,1)
                reduced = erow - u_cur - v_ref[:, :]
                minv = minv_ref[:, :]
                upd = (used == 0) & (reduced < minv) & (a == 1)
                minv = jnp.where(upd, reduced, minv)
                way_ref[:, :] = jnp.where(upd, jfrom_ref[:, :],
                                          way_ref[:, :])
                masked = jnp.where(used == 1, _INF, minv)
                delta = jnp.min(masked, axis=1, keepdims=True)   # (B,1)
                j1 = jnp.argmin(masked, axis=1, keepdims=True
                                ).astype(jnp.int32)              # (B,1)
                u_ref[:, :] = jnp.where(
                    (onpath_ref[:, :] == 1) & (a == 1),
                    u_ref[:, :] + delta, u_ref[:, :])
                v_ref[:, :] = jnp.where((used == 1) & (a == 1),
                                        v_ref[:, :] - delta, v_ref[:, :])
                minv_ref[:, :] = jnp.where(
                    a == 1, jnp.where(used == 1, minv, minv - delta),
                    minv_ref[:, :])
                used_ref[:, :] = jnp.where((idx == j1) & (a == 1), 1,
                                           used)
                nxt = at_lanes(p_out[pass_i, :, :], j1)          # (B,1)
                newly = (nxt < 0) & (a[:, 0:1] == 1)
                jend_ref[:, :] = jnp.where(
                    jnp.broadcast_to(newly, (n_streams, sp)),
                    jnp.broadcast_to(j1, (n_streams, sp)),
                    jend_ref[:, :])
                done_ref[:, :] = jnp.where(
                    jnp.broadcast_to(newly, (n_streams, sp)), 1,
                    done_ref[:, :])
                currow_ref[:, :] = jnp.where(
                    (a == 1) & jnp.broadcast_to(~newly, (n_streams, sp)),
                    jnp.broadcast_to(nxt, (n_streams, sp)),
                    currow_ref[:, :])
                jfrom_ref[:, :] = jnp.where(
                    a == 1, jnp.broadcast_to(j1, (n_streams, sp)),
                    jfrom_ref[:, :])
                n_done = jnp.sum(jnp.where(idx == 0, done_ref[:, :], 0))
                return (it + 1, n_done)

            jax.lax.while_loop(pop_cond, pop_body,
                               (jnp.int32(0), n_done0))

            # Unwind all streams' augmenting paths in lockstep. j0 = sp
            # marks a finished (or never-started) stream.
            currow_ref[:, :] = jnp.where(
                jnp.broadcast_to(rv_i == 1, (n_streams, sp)),
                jend_ref[:, :], sp)

            def unwind_cond(ust):
                return jnp.logical_and(ust[1] > 0, ust[0] < max_iters)

            def unwind_body(ust):
                it, _ = ust
                j0 = currow_ref[:, :]
                act = j0[:, 0:1] < sp                            # (B,1)
                actv = jnp.broadcast_to(act, (n_streams, sp))
                j1 = at_lanes(way_ref[:, :], j0)                 # (B,1)
                p_at = at_lanes(p_out[pass_i, :, :], j1)         # (B,1)
                rowv = jnp.where(j1 >= sp, cur0, p_at)           # (B,1)
                p_out[pass_i, :, :] = jnp.where(
                    (idx == j0) & actv, jnp.broadcast_to(
                        rowv, (n_streams, sp)), p_out[pass_i, :, :])
                q_out[pass_i, :, :] = jnp.where(
                    (idx == rowv) & actv,
                    j0, q_out[pass_i, :, :])
                rv_at = at_lanes(rv, jnp.broadcast_to(
                    rowv, (n_streams, sp)))                      # (B,1)
                live = (rowv < n_rows) & (rv_at == 1)
                plive_out[pass_i, :, :] = jnp.where(
                    (idx == j0) & actv,
                    jnp.where(jnp.broadcast_to(live, (n_streams, sp)),
                              1, 0),
                    plive_out[pass_i, :, :])
                currow_ref[:, :] = jnp.where(
                    actv, jnp.broadcast_to(j1, (n_streams, sp)), j0)
                n_act = jnp.sum(jnp.where(
                    idx == 0,
                    jnp.where(currow_ref[:, :] < sp, 1, 0), 0))
                return (it + 1, n_act)

            n_act0 = jnp.sum(jnp.where(
                idx == 0, jnp.where(currow_ref[:, :] < sp, 1, 0), 0))
            jax.lax.while_loop(unwind_cond, unwind_body,
                               (jnp.int32(0), n_act0))
            return carry

        jax.lax.fori_loop(0, max_act, outer, jnp.int32(0))


def _cascade_call_lockstep(costs, pool, tracked, unconf, high1, high3,
                           low, big, n_rows: int, n_cols: int, limits,
                           max_iters: int, interpret: bool):
    """Lockstep entry: costs [B,3,SP,SP] f32; masks [B,1,SP] int32;
    big [B,1] f32 -> (p, q, plive) each [B,3,1,SP] int32 (the grid
    version's output contract)."""
    bsz, _, sp, _ = costs.shape
    kernel = functools.partial(
        _cascade_kernel_ls, n_streams=bsz, n_rows=n_rows, n_cols=n_cols,
        limits=tuple(limits), max_iters=max_iters)
    c0, c1, c2 = (costs[:, i] for i in range(3))
    masks = [m[:, 0, :] for m in (pool, tracked, unconf, high1, high3,
                                  low)]
    # One shared "big" is sound: any value above every stream's finite
    # max + limit works, so take the max across streams.
    big_s = jnp.max(big).reshape(1, 1)
    full = lambda shape: pl.BlockSpec(shape, lambda: tuple(
        0 for _ in shape))
    out_shape = jax.ShapeDtypeStruct((3, bsz, sp), jnp.int32)
    p, q, plive = pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape, out_shape),
        in_specs=[
            full((bsz, sp, sp)), full((bsz, sp, sp)), full((bsz, sp, sp)),
            full((bsz, sp)), full((bsz, sp)), full((bsz, sp)),
            full((bsz, sp)), full((bsz, sp)), full((bsz, sp)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(full((3, bsz, sp)), full((3, bsz, sp)),
                   full((3, bsz, sp))),
        scratch_shapes=[
            pltpu.VMEM((bsz, sp), jnp.float32),   # minv
            pltpu.VMEM((bsz, sp), jnp.int32),     # way
            pltpu.VMEM((bsz, sp), jnp.int32),     # used
            pltpu.VMEM((bsz, sp), jnp.int32),     # on_path
            pltpu.VMEM((bsz, sp), jnp.float32),   # u
            pltpu.VMEM((bsz, sp), jnp.float32),   # v
            pltpu.VMEM((bsz, sp), jnp.int32),     # currow
            pltpu.VMEM((bsz, sp), jnp.int32),     # jfrom
            pltpu.VMEM((bsz, sp), jnp.int32),     # done
            pltpu.VMEM((bsz, sp), jnp.int32),     # jend
            pltpu.VMEM((bsz, sp), jnp.float32),   # rowbuf
            pltpu.VMEM((bsz, sp), jnp.int32),     # order (compacted)
        ],
        interpret=interpret,
    )(c0, c1, c2, *masks, big_s)
    # [3, B, sp] -> [B, 3, 1, sp]
    reshape = lambda o: jnp.transpose(o, (1, 0, 2))[:, :, None, :]
    return reshape(p), reshape(q), reshape(plive)


def _cascade_call_batched(costs, pool, tracked, unconf, high1, high3,
                          low, big, n_rows: int, n_cols: int, limits,
                          max_iters: int, interpret: bool):
    """costs [B,3,SP,SP] f32; masks [B,1,SP] int32; big [B,1] f32 ->
    (p, q, plive) each [B,3,1,SP] int32."""
    bsz, _, sp, _ = costs.shape
    kernel = functools.partial(
        _cascade_kernel, n_rows=n_rows, n_cols=n_cols,
        limits=tuple(limits), max_iters=max_iters)
    mask_spec = pl.BlockSpec((None, 1, sp), lambda b: (b, 0, 0))
    out_shape = jax.ShapeDtypeStruct((bsz, 3, 1, sp), jnp.int32)
    out_spec = pl.BlockSpec((None, 3, 1, sp), lambda b: (b, 0, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        out_shape=(out_shape, out_shape, out_shape),
        in_specs=[
            pl.BlockSpec((None, 3, sp, sp), lambda b: (b, 0, 0, 0)),
            mask_spec, mask_spec, mask_spec, mask_spec, mask_spec,
            mask_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((1, sp), jnp.float32),   # minv
            pltpu.VMEM((1, sp), jnp.int32),     # way
            pltpu.VMEM((1, sp), jnp.int32),     # used
            pltpu.VMEM((1, sp), jnp.int32),     # on_path
            pltpu.VMEM((1, sp), jnp.float32),   # u
            pltpu.VMEM((1, sp), jnp.float32),   # v
        ],
        interpret=interpret,
    )(costs, pool, tracked, unconf, high1, high3, low, big)


@functools.lru_cache(maxsize=None)
def _get_cascade_call(n_rows: int, n_cols: int, limits, max_iters: int,
                      interpret: bool):
    """custom_vmap wrapper (see _get_jv_call): vmap over streams runs as
    a B-step grid in ONE kernel launch."""

    @jax.custom_batching.custom_vmap
    def call(costs, pool, tracked, unconf, high1, high3, low, big):
        outs = _cascade_call_batched(
            costs[None], pool[None], tracked[None], unconf[None],
            high1[None], high3[None], low[None], big[None],
            n_rows, n_cols, limits, max_iters, interpret)
        return tuple(o[0] for o in outs)

    @call.def_vmap
    def _vmap(axis_size, in_batched, *args):
        args = [
            x if bb else jnp.broadcast_to(x, (axis_size,) + x.shape)
            for x, bb in zip(args, in_batched)
        ]
        impl = (_cascade_call_lockstep if _lockstep_enabled()
                else _cascade_call_batched)
        return impl(
            *args, n_rows, n_cols, limits, max_iters, interpret), (
            True, True, True)

    return call


@functools.partial(jax.jit,
                   static_argnames=("limits", "max_iters", "interpret"))
def cascade_solve_pallas(
    dists1: jnp.ndarray,
    iou_d: jnp.ndarray,
    dists3: jnp.ndarray,
    pool_m: jnp.ndarray,
    tracked_m: jnp.ndarray,
    unconf_m: jnp.ndarray,
    high_m: jnp.ndarray,
    low_m: jnp.ndarray,
    limits: tuple,
    max_iters: int = 4096,
    interpret: bool = False,
):
    """Three chained thresholded-LAP solves in one kernel launch.

    dists1/iou_d/dists3: [N, D] pass costs. pool/tracked/unconf: [N]
    row masks; high/low: [D] col masks. limits: 3 static cost limits.
    Returns ((cfr1, rfc1), (cfr2, rfc2), (cfr3, rfc3)) with
    solve_masked's -1-for-unmatched convention; the pass-2 row mask
    (tracked & pass-1-unmatched) and pass-3 col mask (high &
    pass-1-unmatched) are derived inside the kernel.
    """
    n, d = dists1.shape
    sp = ((n + d + 127) // 128) * 128

    def padded(c):
        c = jnp.nan_to_num(c.astype(jnp.float32), posinf=1e9, neginf=-1e9)
        return jnp.pad(c, ((0, sp - n), (0, sp - d)))

    costs = jnp.stack([padded(dists1), padded(iou_d), padded(dists3)])
    finite_max = jnp.max(jnp.abs(costs[:, :n, :d]))
    big = (finite_max + max(abs(float(x)) for x in limits) + 1.0)[None]

    # Feasibility pre-parking per pass (see solve_masked): endpoints
    # with no entry <= the pass limit are unmatched in every optimal
    # solution, so they enter the kernel parked and cost zero
    # augmentations. Pass-2 rows and pass-3 cols depend on pass-1's
    # matching (derived in-kernel), so their feasibility uses the
    # pre-pass SUPERSET masks (tracked / high) — parking stays sound
    # (the subset's minima can only be larger); kernel-side derivation
    # then intersects with the pass-1 outcome.
    f1 = (pool_m[:, None] & high_m[None, :]
          & (dists1 <= limits[0]))
    pool_f = pool_m & jnp.any(f1, axis=1)
    high1_f = high_m & jnp.any(f1, axis=0)
    f2 = (tracked_m[:, None] & low_m[None, :]
          & (iou_d <= limits[1]))
    tracked_f = tracked_m & jnp.any(f2, axis=1)
    low_f = low_m & jnp.any(f2, axis=0)
    f3 = (unconf_m[:, None] & high_m[None, :]
          & (dists3 <= limits[2]))
    unconf_f = unconf_m & jnp.any(f3, axis=1)
    high3_f = high_m & jnp.any(f3, axis=0)

    def lane(m, width):
        m = m.astype(jnp.int32)
        return jnp.pad(m, (0, sp - width))[None, :]

    p, q, plive = _get_cascade_call(
        n, d, tuple(float(x) for x in limits), max_iters, interpret)(
        costs, lane(pool_f, n), lane(tracked_f, n), lane(unconf_f, n),
        lane(high1_f, d), lane(high3_f, d), lane(low_f, d), big)

    results = []
    for i in range(3):
        qq = q[i, 0, :n]
        cfr = jnp.where((qq >= 0) & (qq < d), qq, -1).astype(jnp.int32)
        rfc = jnp.where(plive[i, 0, :d] > 0, p[i, 0, :d], -1).astype(
            jnp.int32)
        results.append((cfr, rfc))
    return tuple(results)


@functools.partial(jax.jit, static_argnames=("max_iters", "interpret"))
def jv_solve_pallas(
    ext: jnp.ndarray,
    parked: jnp.ndarray,
    parked_col: jnp.ndarray,
    max_iters: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Solve the square extended problem; returns owner_row_for_col [S].

    parked rows start matched to parked_col (complementary slackness at
    zero potentials) and are never augmented.
    """
    s = ext.shape[0]
    # Pad the square problem to a multiple of 128 lanes (native VPU tile
    # width). Real<->pad pairings cost "big" so no augmenting path ever
    # enters the pad region; pad<->pad is 0 (the pre-matched diagonal
    # satisfies complementary slackness at zero potentials).
    sp = ((s + 127) // 128) * 128
    if sp != s:
        ext = jnp.pad(ext, ((0, sp - s), (0, sp - s)),
                      constant_values=1e9)
        pad_blk = (jnp.arange(sp) >= s)
        ext = jnp.where(pad_blk[:, None] & pad_blk[None, :], 0.0, ext)
        parked = jnp.concatenate(
            [parked, jnp.ones((sp - s,), dtype=bool)])
        parked_col = jnp.concatenate(
            [parked_col, jnp.arange(s, sp, dtype=jnp.int32)])
    rows = jnp.arange(sp, dtype=jnp.int32)
    live_order = jnp.sort(jnp.where(parked, sp, rows)).astype(jnp.int32)
    n_live = jnp.sum(jnp.logical_not(parked)).astype(jnp.int32)
    p0 = (
        jnp.full((sp + 1,), -1, dtype=jnp.int32)
        .at[jnp.where(parked, parked_col, sp)]
        .set(rows)[:sp]
    )

    owner = _get_jv_call(max_iters, interpret)(
        ext.astype(jnp.float32), p0[None, :], live_order,
        n_live[None])[0]
    return owner[:s]
