"""Attribution probe for the batched cascade solver kernel.

Times vmapped ``solve_cascade_masked`` (the one-launch Pallas cascade)
at the 8-stream moderate-16 geometry under three loads:

  busy    — the batchedcasc_solver scene (16 live tracked rows, jittered
            feasible dets): real augmentation work + overhead.
  empty   — every det invalid (all endpoints pre-parked): the kernel does
            ZERO augmentations, so this is the pure per-row outer-loop
            overhead (scratch re-inits, while-loop entries) x 240 rows
            x B grid steps.
  half    — 8 live dets.

The busy-empty gap is the real solve work; empty is the overhead the
live-order/pl.when rework targets.
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from botsort_tpu.config import TrackerConfig
    from botsort_tpu.ops.assignment import solve_cascade_masked
    from botsort_tpu.ops.boxes import iou_distance
    from botsort_tpu.runtime.device import setup_compilation_cache
    from tools.perf_probe import time_scan, tunnel_floor

    setup_compilation_cache()
    rng = np.random.default_rng(3)
    B, d = 8, 16
    cfg = dataclasses.replace(
        TrackerConfig(det_score_threshold=0.2, track_high_thresh=0.15,
                      track_low_thresh=0.02, new_track_thresh=0.2),
        max_dets=d)
    n = cfg.max_tracks
    kk = 16

    anchors = rng.uniform(50, 900, (B, d, 2)).astype(np.float32)
    jit_xy = rng.normal(0, 6, (kk, B, d, 2)).astype(np.float32)
    wh = rng.uniform(40, 120, (B, d, 2)).astype(np.float32)
    tl = anchors[None] + jit_xy
    tlbr = jnp.asarray(np.concatenate([tl, tl + wh[None]], -1))
    scores = jnp.asarray(rng.uniform(0.2, 1.0, (kk, B, d)).astype(
        np.float32))
    bf = rng.normal(0, 1, (B, d, 2048)).astype(np.float32)
    bf /= np.linalg.norm(bf, axis=-1, keepdims=True)
    bfk = jnp.asarray(np.broadcast_to(bf, (kk, B, d, 2048)))

    pool_m = jnp.zeros((B, n), bool).at[:, :d].set(True)
    unconf_m = jnp.zeros((B, n), bool)
    track_tlbr = jnp.asarray(np.concatenate([anchors, anchors + wh], -1))
    track_pad = jnp.zeros((B, n, 4), jnp.float32).at[:, :d].set(track_tlbr)
    bf_track = jnp.zeros((B, n, 2048), jnp.float32).at[:, :d].set(
        jnp.asarray(bf))

    def make_step(n_valid):
        def step(p, s, xs):
            t, sc, b_ = xs

            def one_stream(tp, bt, t_, sc_, b2):
                iou_d = iou_distance(tp, t_)
                body_d = 1.0 - bt @ b2.T
                d1 = jnp.minimum(iou_d, body_d)
                dvalid = jnp.arange(d) < n_valid
                high = (sc_ > cfg.track_high_thresh) & dvalid
                low = (sc_ >= cfg.track_low_thresh) & ~high & dvalid
                r1, r2, r3 = solve_cascade_masked(
                    d1, iou_d, d1, pool_m[0], pool_m[0], unconf_m[0],
                    high, low,
                    (cfg.match_thresh, cfg.second_match_thresh,
                     cfg.unconfirmed_match_thresh))
                return r1.col_for_row + r2.col_for_row + r3.col_for_row

            out = jax.vmap(one_stream)(track_pad, bf_track, t, sc, b_)
            return s, out
        return step

    for label, n_valid in [("busy", d), ("half", 8), ("empty", 0)]:
        sec = time_scan(make_step(n_valid), jnp.zeros(()), jnp.zeros(()),
                        (tlbr, scores, bfk), kk)
        print(json.dumps({"stage": f"casc_{label}_B{B}_d{d}",
                          "ms": round(sec * 1e3, 3)}), flush=True)
    print(json.dumps({"floor_ms": round(tunnel_floor() * 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
