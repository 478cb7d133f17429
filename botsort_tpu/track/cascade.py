"""The BoT-SORT association cascade as a single jittable function.

Re-implements the per-frame logic of ``BoTSORT.update``
(demo_bottrack_onnx_tflite.py:1291-1639) over the SoA track store: three
assignment passes, Kalman predict/update, dual-appearance cost fusion,
lifecycle transitions, lost-track expiry, and cross-list deduplication —
all fixed-shape array ops, so the whole thing fuses into the frame step
with zero host round-trips.

Pass structure (thresholds from TrackerConfig, demo:1268-1277):
  1. pool (activated-tracked + lost) x high-score dets:
     dists = min(iou_dist, emb') with
     emb' = where(min(body_dist, face_dist) > appearance_thresh, 1, body_dist)
     — note the reference's proximity mask is AND-ed with the appearance
     mask and then used to set entries that are already 1 (demo:1540-1553),
     so proximity_thresh has no effect in this pass; we reproduce the
     effective math. lapjv cost_limit = match_thresh (0.8).
  2. still-Tracked unmatched pool rows x low-score dets, IoU only,
     cost_limit 0.5; unmatched rows -> Lost (demo:1568-1586).
  3. unconfirmed tracks x leftover high dets: IoU + clamped body cosine,
     appearance mask sets 1, proximity mask sets 1 (here it *does* apply,
     demo:1591-1601), cost_limit 0.7; unmatched unconfirmed -> removed.
  New tracks from leftover high dets with score >= new_track_thresh;
  lost tracks expire after max_time_lost frames since last update;
  tracked/lost pairs with IoU-dist < 0.15 drop the shorter-lived track
  (demo:1665-1680).

Deviations from the reference (documented):
  - Face-similarity anomaly mask: the reference zeroes similarities
    bit-close to 0.9999999 (a workaround for zero-face-image pairs whose
    embeddings are identical, demo:1481-1483); we zero any similarity
    > 0.99999, which catches the same degenerate case robustly.
  - Exact assignment ties may resolve differently (both optimal; see
    ops/assignment.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from botsort_tpu.config import TrackerConfig
from botsort_tpu.ops import assignment, kalman
from botsort_tpu.ops.boxes import (
    iou_distance,
    tlbr_to_tlwh,
    tlwh_to_xywh,
    xywh_to_tlbr,
)
from botsort_tpu.track.state import FREE, LOST, TRACKED, TrackStore


class TrackOutputs(NamedTuple):
    """Per-frame readback (the only device->host transfer besides timing).

    valid: [N] bool — slot holds a currently-Tracked track (the
      reference's returned ``tracked_stracks``, incl. unconfirmed).
    tlbr: [N, 4]; track_id/score: [N]; det_index: [N] int32 — index of the
      body-detection slot this track matched this frame (every returned
      track matched or was created from a detection; used by the host to
      propagate track ids into the box hierarchy, demo:612-622).
    """

    valid: jnp.ndarray
    tlbr: jnp.ndarray
    track_id: jnp.ndarray
    score: jnp.ndarray
    det_index: jnp.ndarray
    # [] int32 — new-track candidates dropped because all max_tracks
    # slots were occupied (the reference has no slot limit; a nonzero
    # value means max_tracks must be raised to preserve parity).
    dropped_new: jnp.ndarray


def _ema_update(smooth: jnp.ndarray, feat: jnp.ndarray, alpha: float,
                apply: jnp.ndarray) -> jnp.ndarray:
    """smooth' = normalize(alpha*smooth + (1-alpha)*feat) on masked rows
    (demo:492-514)."""
    mixed = alpha * smooth + (1.0 - alpha) * feat
    norm = jnp.linalg.norm(mixed, axis=-1, keepdims=True)
    mixed = mixed / jnp.maximum(norm, 1e-12)
    return jnp.where(apply[:, None], mixed, smooth)


@partial(jax.jit, static_argnames=("cfg",))
def tracker_update(
    store: TrackStore,
    det_tlbr: jnp.ndarray,
    det_score: jnp.ndarray,
    det_valid: jnp.ndarray,
    det_body_feat: jnp.ndarray,
    det_face_feat: jnp.ndarray,
    cfg: TrackerConfig,
    gmc_affine: jnp.ndarray | None = None,
) -> Tuple[TrackStore, TrackOutputs]:
    """One tracker frame. All det_* arrays are padded to [D] slots.

    det_tlbr: [D, 4] body boxes in source-image pixels.
    det_score: [D]; det_valid: [D] (post detector-score-threshold).
    det_body_feat: [D, Db] L2-normalized; det_face_feat: [D, Df]
      L2-normalized (zero-face-image embedding when the body has no face,
      as in the reference, demo:1437-1441).
    gmc_affine: optional [2, 3] camera-motion matrix (prev->current
      frame); applied to pool + unconfirmed states after predict — the
      reference's multi_gmc call sites, which it left commented out
      (demo:1534-1536); see ops/kalman.py::apply_affine.
    """
    n = store.state.shape[0]
    frame = store.frame_count + 1

    tracked_m = (store.state == TRACKED) & store.is_activated
    unconfirmed_m = (store.state == TRACKED) & ~store.is_activated
    lost_m = store.state == LOST
    pool_m = tracked_m | lost_m

    # --- KF predict over the pool (demo:1426); lost tracks get vw,vh
    # zeroed first (demo:529-532). Unconfirmed tracks are NOT predicted.
    mean_z = jnp.where(
        (lost_m)[:, None] & (jnp.arange(8) >= 6)[None, :], 0.0, store.mean)
    mean_p, cov_p = kalman.predict(mean_z, store.cov)
    mean = jnp.where(pool_m[:, None], mean_p, store.mean)
    cov = jnp.where(pool_m[:, None, None], cov_p, store.cov)

    if gmc_affine is not None:
        gmc_m = pool_m | unconfirmed_m
        mean_g, cov_g = kalman.apply_affine(mean, cov, gmc_affine)
        mean = jnp.where(gmc_m[:, None], mean_g, mean)
        cov = jnp.where(gmc_m[:, None, None], cov_g, cov)

    track_tlbr = xywh_to_tlbr(mean[:, :4])
    det_xywh = tlwh_to_xywh(tlbr_to_tlwh(det_tlbr))

    high_m = det_valid & (det_score > cfg.track_high_thresh)
    low_m = (
        det_valid
        & (det_score >= cfg.track_low_thresh)
        & (det_score <= cfg.track_high_thresh)
    )

    # --- Pass 1: pool x high dets, IoU + dual-appearance fusion.
    iou_d = iou_distance(track_tlbr, det_tlbr)                  # [N, D]
    body_sim = store.body_feat @ det_body_feat.T                # [N, D]
    face_sim = store.face_feat @ det_face_feat.T
    # Degenerate-identical (zero-face-image) pairs -> 0 (see module doc).
    face_sim = jnp.where(face_sim > 0.99999, 0.0, face_sim)
    body_d = 1.0 - body_sim
    face_d = 1.0 - face_sim
    gate = jnp.minimum(body_d, face_d) > cfg.appearance_thresh
    emb = jnp.where(gate, 1.0, body_d)
    dists1 = jnp.minimum(iou_d, emb)

    # Pass-3 cost (demo:1594-1601), built up front so all three chained
    # solves run as ONE kernel launch (solve_cascade_masked; the
    # pass-2/3 masks derive from pass 1's matching inside the kernel,
    # and infeasible rows/cols are pre-parked — docs/PERF.md "The
    # garbage-detection solver load").
    emb3 = 1.0 - jnp.maximum(0.0, body_sim)                      # demo:1599
    emb3 = jnp.where(emb3 > cfg.appearance_thresh, 1.0, emb3)
    emb3 = jnp.where(iou_d > cfg.proximity_thresh, 1.0, emb3)    # demo:1601
    dists3 = jnp.minimum(iou_d, emb3)

    res1, res2, res3 = assignment.solve_cascade_masked(
        dists1, iou_d, dists3, pool_m, tracked_m, unconfirmed_m,
        high_m, low_m,
        (cfg.match_thresh, cfg.second_match_thresh,
         cfg.unconfirmed_match_thresh))

    # Pass 2 rows were unmatched still-Tracked rows x low dets (IoU
    # only); pass 3 unconfirmed x leftover high dets.
    r_tracked_m = tracked_m & (res1.col_for_row < 0)
    newly_lost_m = r_tracked_m & (res2.col_for_row < 0)
    removed_unconfirmed_m = unconfirmed_m & (res3.col_for_row < 0)
    leftover_m = high_m & (res1.row_for_col < 0)

    # --- Fused measurement update for all matched rows (disjoint row sets).
    det_for_row = jnp.where(
        res1.col_for_row >= 0, res1.col_for_row,
        jnp.where(res2.col_for_row >= 0, res2.col_for_row,
                  res3.col_for_row))
    matched_m = det_for_row >= 0
    j = jnp.clip(det_for_row, 0, det_tlbr.shape[0] - 1)
    mean_u, cov_u = kalman.update(mean, cov, det_xywh[j])
    mean = jnp.where(matched_m[:, None], mean_u, mean)
    cov = jnp.where(matched_m[:, None, None], cov_u, cov)

    was_lost_refound = matched_m & lost_m
    body_feat = jnp.where(matched_m[:, None], det_body_feat[j],
                          store.body_feat)
    face_feat = jnp.where(matched_m[:, None], det_face_feat[j],
                          store.face_feat)
    body_smooth = _ema_update(store.body_smooth, det_body_feat[j],
                              cfg.feature_ema_alpha, matched_m)
    face_smooth = _ema_update(store.face_smooth, det_face_feat[j],
                              cfg.feature_ema_alpha, matched_m)

    state = store.state
    is_activated = store.is_activated
    score = jnp.where(matched_m, det_score[j], store.score)
    frame_id = jnp.where(matched_m, frame, store.frame_id)
    # update: len += 1; re_activate (lost match): len = 0 (demo:577,595).
    tracklet_len = jnp.where(
        matched_m,
        jnp.where(was_lost_refound, 0, store.tracklet_len + 1),
        store.tracklet_len,
    )
    state = jnp.where(matched_m, TRACKED, state)
    is_activated = jnp.where(matched_m, True, is_activated)

    # Newly lost (pass-2 unmatched Tracked rows) — demo:1582-1586.
    state = jnp.where(newly_lost_m, LOST, state)
    # Unmatched unconfirmed -> removed (slot freed) — demo:1609-1612.
    state = jnp.where(removed_unconfirmed_m, FREE, state)

    # --- New tracks from remaining high dets (demo:1614-1621).
    remaining_m = leftover_m & (res3.row_for_col < 0)
    new_m = remaining_m & (det_score >= cfg.new_track_thresh)
    free_m = state == FREE
    det_rank = jnp.cumsum(new_m) - 1                              # [D]
    slot_rank = jnp.cumsum(free_m) - 1                            # [N]
    num_free = jnp.sum(free_m)
    # slot_of_rank[r] = index of the r-th free slot.
    slot_of_rank = (
        jnp.full((n + 1,), n, jnp.int32)
        .at[jnp.where(free_m, slot_rank, n)]
        .set(jnp.arange(n, dtype=jnp.int32))
    )
    fits = new_m & (det_rank < num_free)
    target_slot = jnp.where(fits, slot_of_rank[jnp.clip(det_rank, 0, n)], n)

    def scatter(arr, vals):
        # Scatter det-indexed values into track slots via an [n+1] buffer.
        buf = jnp.concatenate([arr, jnp.zeros_like(arr[:1])], axis=0)
        return buf.at[target_slot].set(vals)[:n]

    new_mean, new_cov = kalman.initiate(det_xywh)
    mean = scatter(mean, new_mean)
    cov = scatter(cov, new_cov)
    state = scatter(state, jnp.where(fits, TRACKED, FREE).astype(state.dtype))
    # activate(): is_activated only on frame 1 (demo:565-566).
    is_activated = scatter(is_activated, fits & (frame == 1))
    score = scatter(score, det_score)
    frame_id = scatter(frame_id, jnp.full_like(det_rank, frame))
    start_frame_arr = scatter(store.start_frame,
                              jnp.full_like(det_rank, frame))
    tracklet_len = scatter(tracklet_len, jnp.zeros_like(det_rank))
    # fits is a prefix of new_m in rank order (once det_rank >= num_free
    # every later candidate also overflows), so det_rank equals the
    # fitting-candidate rank wherever fits holds and ids stay dense.
    # next_id advances only by CREATED tracks: on slot exhaustion the
    # reference (which has no slot limit) would create the track, so we
    # surface the drop via dropped_new instead of silently burning ids.
    new_ids = store.next_id + 1 + det_rank.astype(jnp.int32)
    track_id = scatter(store.track_id, new_ids)
    next_id = store.next_id + jnp.sum(fits).astype(jnp.int32)
    dropped_new = (jnp.sum(new_m) - jnp.sum(fits)).astype(jnp.int32)
    body_feat = scatter(body_feat, det_body_feat)
    face_feat = scatter(face_feat, det_face_feat)
    # STrack.__init__ -> update_*_features: smooth = normalize(feat)
    # (demo:497-502; det features arrive normalized).
    body_smooth = scatter(body_smooth, det_body_feat)
    face_smooth = scatter(face_smooth, det_face_feat)

    det_index = jnp.where(matched_m, det_for_row, -1)
    det_index = scatter(det_index, jnp.arange(det_tlbr.shape[0],
                                              dtype=jnp.int32))
    det_index = jnp.where(state == TRACKED, det_index, -1)

    # --- Expire lost tracks (demo:1623-1627).
    expired_m = (state == LOST) & (frame - frame_id > cfg.max_time_lost)
    state = jnp.where(expired_m, FREE, state)

    # --- Dedup tracked vs lost by IoU (demo:1665-1680): for pairs with
    # IoU-dist < 0.15 drop the shorter-lived side (tie drops the tracked
    # one, matching `if timep > timeq`).
    final_tlbr = xywh_to_tlbr(mean[:, :4])
    trk_m = state == TRACKED
    lst_m = state == LOST
    dd = iou_distance(final_tlbr, final_tlbr)
    pair = (dd < 0.15) & trk_m[:, None] & lst_m[None, :]
    lifetime = frame_id - start_frame_arr
    p_longer = lifetime[:, None] > lifetime[None, :]
    drop_lost = jnp.any(pair & p_longer, axis=0)       # over tracked rows
    drop_tracked = jnp.any(pair & ~p_longer, axis=1)   # over lost cols
    state = jnp.where(drop_lost | drop_tracked, FREE, state)

    new_store = store._replace(
        state=state,
        is_activated=is_activated & (state != FREE),
        track_id=track_id,
        score=score,
        frame_id=frame_id,
        start_frame=start_frame_arr,
        tracklet_len=tracklet_len,
        mean=mean,
        cov=cov,
        body_feat=body_feat,
        body_smooth=body_smooth,
        face_feat=face_feat,
        face_smooth=face_smooth,
        det_index=det_index,
        next_id=next_id,
        frame_count=frame,
    )
    if store.body_hist is not None:
        # Optional feature-history ring buffer (capability parity with the
        # reference's 300-deep per-track deques, demo:481,488). Every slot
        # that received a detection feature this frame (matched or newly
        # created) appends to its ring; new tracks restart at position 0.
        wrote = det_index >= 0
        is_new = wrote & (start_frame_arr == frame)
        pos = jnp.where(is_new, 0, store.hist_pos)
        h = store.body_hist.shape[1]
        rows = jnp.arange(n)
        slot = pos % h
        body_hist = store.body_hist.at[rows, slot].set(
            jnp.where(wrote[:, None], body_feat,
                      store.body_hist[rows, slot]))
        face_hist = store.face_hist.at[rows, slot].set(
            jnp.where(wrote[:, None], face_feat,
                      store.face_hist[rows, slot]))
        new_store = new_store._replace(
            body_hist=body_hist,
            face_hist=face_hist,
            hist_pos=jnp.where(wrote, pos + 1, pos),
        )

    outputs = TrackOutputs(
        valid=state == TRACKED,
        tlbr=final_tlbr,
        track_id=track_id,
        score=score,
        det_index=det_index,
        dropped_new=dropped_new,
    )
    return new_store, outputs
