"""Offline cascade-solver study: capture bench-scene cost matrices on
CPU, then simulate the Pallas cascade kernel's phases in numpy.

Why this exists (round 5 session 2): the loaded bench scene's cascade
tail (~1.35 ms) turned out to be a degenerate-features artifact — the
random-init encoders map every crop to nearly the same feature
direction, so the pass-1 cost matrix is near-rank-1 and ~96 of the 114
extended rows need near-tie Dijkstra augmentation (~26 pops each,
~2,543 pops/frame simulated). This tool reproduces that attribution
end-to-end WITHOUT touching the TPU:

  capture  — run the full pipeline on CPU for K frames of the exact
             bench scene (random 1080p frames, lowered thresholds as in
             bench.py) and save the per-frame solver inputs; the cost
             construction duplicates track/cascade.py:114-163 on the
             pre-update store so the matrices are exactly what the
             solver sees.
  sim      — replay the kernel's initialization phases (pre-parking ->
             designated parking -> column reduction -> leftover pairing
             -> escape fast-path -> free-column claims; mirrors
             ops/assignment_pallas.py::_cascade_kernel +
             _post_reduction_resolve) and pop-count the remaining
             Dijkstra augmentation, with/without the resolve steps.
  arr      — lapjv's augmenting row reduction between the column
             reduction and Dijkstra. Measured NET NEGATIVE on this
             regime (0.93x: steal chains just shuffle a near-constant
             matrix) — kept as the recorded negative result
             (docs/PERF.md "degenerate-features artifact").

Usage:
  python tools/solver_sim.py capture   # writes /tmp/bench_costs.npz
  python tools/solver_sim.py sim
  python tools/solver_sim.py arr
"""
from __future__ import annotations

import sys

import numpy as np

INF = np.inf
NPZ = "/tmp/bench_costs.npz"
LIMITS = (0.8, 0.5, 0.7)  # match / second_match / unconfirmed defaults
CAP_KEYS = ("dists1", "iou_d", "dists3", "pool_m", "tracked_m",
            "unconf_m", "high_m", "low_m")


# --------------------------------------------------------------- capture

def capture(K: int = 24) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from botsort_tpu.config import (NMSConfig, PipelineConfig,
                                    TrackerConfig)
    from botsort_tpu.models import fastreid as fastreid_mod
    from botsort_tpu.ops import hierarchy as hier_mod
    from botsort_tpu.ops import kalman
    from botsort_tpu.ops import nms as nms_mod
    from botsort_tpu.ops.boxes import (iou_distance, tlbr_to_tlwh,
                                       tlwh_to_xywh, xywh_to_tlbr)
    from botsort_tpu.pipeline import frame_step as fs
    from botsort_tpu.runtime import assets
    from botsort_tpu.track.cascade import tracker_update
    from botsort_tpu.track.state import LOST, TRACKED, empty_store

    bundle = assets.build_bundle(fake_params=True)
    cfg = TrackerConfig(det_score_threshold=0.2, track_high_thresh=0.15,
                        track_low_thresh=0.02, new_track_thresh=0.2)
    nms_cfg, pipe_cfg = NMSConfig(), PipelineConfig()
    in_h, in_w = pipe_cfg.detector_input_hw
    d = fs._det_width(cfg, nms_cfg)
    r = pipe_cfg.max_reid_batch
    dp = -(-d // r) * r
    face_bucket = 16
    rng = np.random.default_rng(0)
    frame_list = [
        jnp.asarray(rng.integers(0, 255, (1080, 1920, 3)), jnp.uint8)
        for _ in range(4)
    ]

    @jax.jit
    def step(b, s, frame_bgr):
        src_h, src_w = frame_bgr.shape[0], frame_bgr.shape[1]
        pdt = fs._compute_dtype(pipe_cfg)
        fullbox = jnp.asarray(
            [[0.0, 0.0, float(src_w), float(src_h)]], jnp.float32)
        det_in = fs._crop(frame_bgr, fullbox, (in_h, in_w), pdt, pipe_cfg)
        cb, cs = b.detector.apply(b.detector_params, det_in)
        dets = nms_mod.multiclass_nms_dense(
            cb[0], cs[0], iou_threshold=nms_cfg.iou_threshold,
            score_threshold=nms_cfg.score_threshold,
            max_per_class=nms_cfg.max_boxes_per_class,
            pre_nms_top_k=nms_cfg.pre_nms_top_k)
        det_boxes = fs._rescale_to_source(
            dets.boxes, (in_h, in_w), (src_h, src_w))
        det_valid = dets.valid & (dets.scores > cfg.det_score_threshold)
        results = hier_mod.greedy_assign_batch([
            (det_boxes[1], det_valid[1], det_boxes[3], det_valid[3], 1),
            (det_boxes[0], det_valid[0], det_boxes[1], det_valid[1], 1),
            (det_boxes[0], det_valid[0], det_boxes[2], det_valid[2], 2),
        ])
        (face_for_head,) = results[0]
        (head_for_body,) = results[1]
        body_tlbr_p = fs._pad_slots(det_boxes[0], dp)
        body_valid = det_valid[0][:d]
        n_live = jnp.sum(body_valid)

        def encode_body(tlbr_chunk):
            crops = fs._crop(frame_bgr, tlbr_chunk,
                             pipe_cfg.body_reid_input_hw, pdt, pipe_cfg)
            return b.body_encoder.apply(
                b.body_params, fastreid_mod.preprocess(crops))

        body_feats = fs._encode_chunked(
            encode_body, body_tlbr_p, n_live, r,
            cfg.body_feature_dim, static_bucket=d)[:d]
        hb = fs._pad_slots(head_for_body, dp, fill=-1)
        fb = jnp.where(hb >= 0, face_for_head[jnp.clip(hb, 0, None)], -1)
        has_face = fb >= 0
        face_tlbr = jnp.where(
            has_face[:, None],
            det_boxes[3][jnp.clip(fb, 0, None)],
            jnp.zeros((dp, 4), jnp.float32))

        def encode_face(tlbr_chunk):
            crops = fs._crop(frame_bgr, tlbr_chunk,
                             pipe_cfg.face_reid_input_hw, pdt, pipe_cfg)
            return b.face_encoder.apply(b.face_params, crops)

        face_feats = fs._encode_faces(
            encode_face, face_tlbr, has_face, n_live, r,
            cfg.face_feature_dim, static_bucket=face_bucket)[:d]
        det_tlbr = det_boxes[0][:d]
        det_score = dets.scores[0][:d]

        # Duplicate tracker_update's cost construction
        # (track/cascade.py:114-163) on the PRE-update store.
        tracked_m = (s.state == TRACKED) & s.is_activated
        unconfirmed_m = (s.state == TRACKED) & ~s.is_activated
        lost_m = s.state == LOST
        pool_m = tracked_m | lost_m
        mean_z = jnp.where(
            (lost_m)[:, None] & (jnp.arange(8) >= 6)[None, :],
            0.0, s.mean)
        mean_p, _cov_p = kalman.predict(mean_z, s.cov)
        mean = jnp.where(pool_m[:, None], mean_p, s.mean)
        track_tlbr = xywh_to_tlbr(mean[:, :4])
        high_m = body_valid & (det_score > cfg.track_high_thresh)
        low_m = (body_valid & (det_score >= cfg.track_low_thresh)
                 & (det_score <= cfg.track_high_thresh))
        iou_d = iou_distance(track_tlbr, det_tlbr)
        body_sim = s.body_feat @ body_feats.T
        face_sim = s.face_feat @ face_feats.T
        face_sim = jnp.where(face_sim > 0.99999, 0.0, face_sim)
        body_d = 1.0 - body_sim
        face_d = 1.0 - face_sim
        gate = jnp.minimum(body_d, face_d) > cfg.appearance_thresh
        emb = jnp.where(gate, 1.0, body_d)
        dists1 = jnp.minimum(iou_d, emb)
        emb3 = 1.0 - jnp.maximum(0.0, body_sim)
        emb3 = jnp.where(emb3 > cfg.appearance_thresh, 1.0, emb3)
        emb3 = jnp.where(iou_d > cfg.proximity_thresh, 1.0, emb3)
        dists3 = jnp.minimum(iou_d, emb3)

        s2, _tracks = tracker_update(s, det_tlbr, det_score, body_valid,
                                     body_feats, face_feats, cfg)
        cap = dict(dists1=dists1, iou_d=iou_d, dists3=dists3,
                   pool_m=pool_m, tracked_m=tracked_m,
                   unconf_m=unconfirmed_m, high_m=high_m, low_m=low_m)
        return s2, cap

    store = empty_store(cfg)
    caps = []
    for t in range(K):
        store, cap = step(bundle, store, frame_list[t % 4])
        caps.append({k: np.asarray(v) for k, v in cap.items()})
        print("frame", t, "pool", int(caps[-1]["pool_m"].sum()),
              "high", int(caps[-1]["high_m"].sum()),
              "low", int(caps[-1]["low_m"].sum()), flush=True)
    np.savez(NPZ, **{f"{k}_{t}": c[k]
                     for t, c in enumerate(caps) for k in c})
    print("saved", K, "frames ->", NPZ)


# ------------------------------------------------------------ simulation

def _ext_row_fn(cost, rv, cv, half, big):
    N, D = cost.shape
    S = N + D

    def ext_row(r):
        row = np.empty(S)
        if r < N:
            if rv[r]:
                row[:D] = np.where(cv, cost[r], big)
                row[D:] = half
            else:
                row[:D] = big
                row[D:] = 0.0
        else:
            j = r - N
            row[:D] = np.where(cv, half, 0.0)
            row[D:] = 0.0
        return row

    return ext_row


def _init_phase(cost, rv, cv, half):
    """Designated parking + column reduction + leftover pairing —
    mirrors _cascade_kernel's vectorized initialization."""
    N, D = cost.shape
    S = N + D
    p = np.full(S, -1, np.int64)
    q = np.full(S, -1, np.int64)
    u = np.zeros(S)
    v = np.zeros(S)
    for j in range(D):
        if not cv[j]:
            p[j] = N + j
            q[N + j] = j
    for i in range(N):
        if not rv[i]:
            q[i] = D + i
            p[D + i] = i
    wins = 0
    if rv.any():
        sub = np.where(rv[:, None] & cv[None, :], cost, INF)
        colmin = sub.min(axis=0)
        rowarg = sub.argmin(axis=0)
        claim_live = cv & (colmin < half)
        claim_dummy = cv & ~claim_live
        firstj = {}
        for j in range(D):
            if claim_live[j]:
                i = rowarg[j]
                if i not in firstj:
                    firstj[i] = j
        for i, j in firstj.items():
            p[j] = i
            q[i] = j
        wins = len(firstj)
        for j in range(D):
            if claim_dummy[j]:
                p[j] = N + j
                q[N + j] = j
        v[:D] = np.where(cv, np.minimum(colmin, half), 0.0)
    rows_a = [N + j for j in range(D) if 0 <= p[j] < N and cv[j]]
    cols_b = [D + i for i in range(N) if rv[i]]
    for k, rr in enumerate(rows_a):
        q[rr] = cols_b[k]
        p[cols_b[k]] = rr
    return p, q, u, v, wins, len(rows_a)


def _resolve_phase(cost, rv, cv, half, p, q, u, v, b_rounds=2):
    """_post_reduction_resolve in numpy: (a) escape fast-path,
    (b) free-column claims."""
    N, D = cost.shape
    S = N + D
    ra = rb = 0
    live_js = np.where(cv)[0]
    for i in range(N):
        if rv[i] and q[i] < 0:
            rm = ((cost[i, live_js] - v[live_js]).min()
                  if live_js.size else INF)
            if rm >= half:
                for c in range(D, S):
                    if p[c] < 0 and rv[c - D]:
                        p[c] = i
                        q[i] = c
                        u[i] = half
                        ra += 1
                        break
    for _ in range(b_rounds):
        act = [i for i in range(N) if rv[i] and q[i] < 0]
        claims = {}
        for i in act:
            if not live_js.size:
                continue
            red = cost[i, live_js] - v[live_js]
            rowmin = red.min()
            free_js = live_js[p[live_js] < 0]
            if not free_js.size:
                continue
            redf = cost[i, free_js] - v[free_js]
            fm = redf.min()
            if fm <= rowmin and fm <= half:
                j = free_js[redf.argmin()]
                if j not in claims:        # lowest row wins (act ascends)
                    claims[j] = (i, rowmin)
        for j, (i, rowmin) in claims.items():
            p[j] = i
            q[i] = j
            u[i] = rowmin
            rb += 1
    # (c) dummy-row completion: unassigned live dummy rows rank-pair
    # with the remaining free escape columns at u = 0 (reduced cost 0).
    rc = 0
    dums = [N + j for j in range(D) if cv[j] and q[N + j] < 0]
    escs = [c for c in range(D, S) if p[c] < 0 and rv[c - D]]
    for k in range(min(len(dums), len(escs))):
        q[dums[k]] = escs[k]
        p[escs[k]] = dums[k]
        rc += 1
    return ra, rb + rc


def _augment_phase(cost, rv, cv, half, big, p, q, u, v):
    """Pop-counted Dijkstra augmentation for the remaining active rows."""
    N, D = cost.shape
    S = N + D
    ext_row = _ext_row_fn(cost, rv, cv, half, big)
    active = [i for i in range(S) if q[i] < 0 and
              ((i < N and rv[i]) or (i >= N and cv[i - N]))]
    pops = 0
    for i0 in active:
        minv = np.full(S, INF)
        way = np.full(S, -1, np.int64)
        used = np.zeros(S, bool)
        onpath = np.zeros(S, bool)
        cur, j_from = i0, -1
        while True:
            pops += 1
            onpath[cur] = True
            red = ext_row(cur) - u[cur] - v
            upd = ~used & (red < minv)
            minv[upd] = red[upd]
            way[upd] = j_from
            masked = np.where(used, INF, minv)
            j1 = masked.argmin()
            delta = masked[j1]
            u[onpath] += delta
            v[used] -= delta
            minv[~used] -= delta
            used[j1] = True
            nxt = p[j1]
            if nxt < 0:
                break
            cur = nxt
            j_from = j1
        j0 = j1
        while j0 >= 0:
            j1w = way[j0]
            row = i0 if j1w < 0 else p[j1w]
            p[j0] = row
            q[row] = j0
            j0 = j1w
    return pops, len(active)


def _arr_phase(cost, rv, cv, half, big, p, q, u, v, arr_passes=2,
               cap=100000):
    """lapjv's augmenting row reduction (steal chains); returns steps."""
    N, D = cost.shape
    S = N + D
    ext_row = _ext_row_fn(cost, rv, cv, half, big)
    free = [i for i in range(S) if q[i] < 0 and
            ((i < N and rv[i]) or (i >= N and cv[i - N]))]
    steps = 0
    for loop in range(arr_passes):
        k = 0
        prvnumfree = len(free)
        newfree = []
        while k < prvnumfree and steps < cap:
            i = free[k]
            k += 1
            steps += 1
            r = ext_row(i) - v
            j1 = int(r.argmin())
            umin = r[j1]
            r2 = r.copy()
            r2[j1] = INF
            j2 = int(r2.argmin())
            usubmin = r2[j2]
            u[i] = usubmin
            if umin < usubmin:
                v[j1] -= (usubmin - umin)
            elif p[j1] >= 0:
                j1 = j2
            i0 = p[j1]
            p[j1] = i
            q[i] = j1
            if i0 >= 0:
                q[i0] = -1
                if umin < usubmin:
                    k -= 1
                    free[k] = i0
                else:
                    newfree.append(i0)
        free = newfree
    return steps


def _solve_pass(cost, rv_mask, cv_mask, limit, resolve=True, arr=False):
    half = limit / 2.0
    rv = rv_mask.astype(bool)
    cv = cv_mask.astype(bool)
    big = np.abs(cost).max() + abs(limit) + 1.0
    p, q, u, v, wins, pairs = _init_phase(cost, rv, cv, half)
    ra = rb = steps = 0
    if resolve:
        ra, rb = _resolve_phase(cost, rv, cv, half, p, q, u, v)
    if arr:
        steps = _arr_phase(cost, rv, cv, half, big, p, q, u, v)
    pops, active = _augment_phase(cost, rv, cv, half, big, p, q, u, v)
    return p, q, dict(live_rows=int(rv.sum()), live_cols=int(cv.sum()),
                      col_red_wins=wins, leftover_pairs=pairs,
                      resolve_a=ra, resolve_b=rb, arr_steps=steps,
                      active=active, pops=pops)


def _objective(cost, rv, cv, limit, p):
    N, D = cost.shape
    S = N + D
    half = limit / 2.0
    big = np.abs(cost).max() + abs(limit) + 1.0
    ext_row = _ext_row_fn(cost, rv.astype(bool), cv.astype(bool),
                          half, big)
    return sum(ext_row(p[j])[j] for j in range(S) if p[j] >= 0)


def run_frame(c, resolve=True, arr=False):
    d1, iou, d3 = c["dists1"], c["iou_d"], c["dists3"]
    pool, tracked, unconf = c["pool_m"], c["tracked_m"], c["unconf_m"]
    high, low = c["high_m"], c["low_m"]
    N, D = d1.shape
    f1 = pool[:, None] & high[None, :] & (d1 <= LIMITS[0])
    pool_f = pool & f1.any(1)
    high1_f = high & f1.any(0)
    p1, q1, s1 = _solve_pass(d1, pool_f, high1_f, LIMITS[0], resolve, arr)
    unmatched1 = np.array([q1[i] >= D or q1[i] < 0 for i in range(N)])
    rv2 = tracked & unmatched1
    f2 = rv2[:, None] & low[None, :] & (iou <= LIMITS[1])
    p2, q2, s2 = _solve_pass(iou, rv2 & f2.any(1), low & f2.any(0),
                             LIMITS[1], resolve, arr)
    plive1 = np.array([0 <= p1[j] < N and pool_f[p1[j]]
                       for j in range(D)])
    cv3 = high & ~plive1
    f3 = unconf[:, None] & cv3[None, :] & (d3 <= LIMITS[2])
    p3, q3, s3 = _solve_pass(d3, unconf & f3.any(1), cv3 & f3.any(0),
                             LIMITS[2], resolve, arr)
    return (s1, s2, s3)


def simulate(arr: bool = False) -> None:
    data = np.load(NPZ)
    K = len({k.rsplit("_", 1)[1] for k in data.files})
    tot = {"base": 0, "var": 0}
    for t in range(K):
        c = {k: data[f"{k}_{t}"] for k in CAP_KEYS}
        sb = run_frame(c, resolve=False, arr=False)
        sv = run_frame(c, resolve=True, arr=arr)
        pb = sum(s["pops"] for s in sb)
        pv = sum(s["pops"] + s["arr_steps"] for s in sv)
        tot["base"] += pb
        tot["var"] += pv
        if t in (1, K - 1):
            print(f"frame {t}: base pops={pb} variant={pv} "
                  f"pass1={sv[0]}")
    name = "resolve+arr" if arr else "resolve"
    print(f"TOTAL sequential steps over {K} frames: "
          f"baseline={tot['base']} {name}={tot['var']}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "sim"
    if mode == "capture":
        capture(int(sys.argv[2]) if len(sys.argv) > 2 else 24)
    elif mode == "sim":
        simulate(arr=False)
    elif mode == "arr":
        simulate(arr=True)
    else:
        raise SystemExit(f"unknown mode {mode!r} (capture|sim|arr)")


if __name__ == "__main__":
    main()
