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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30  # plain float: Pallas kernels cannot capture array constants


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
