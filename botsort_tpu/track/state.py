"""Structure-of-arrays track store over fixed slots.

The reference keeps tracks as Python object lists (``tracked_stracks``,
``lost_stracks``, ``removed_stracks``) with per-object numpy state and a
global id counter (demo_bottrack_onnx_tflite.py:382-688, 1261-1264). On
TPU the whole store is a pytree of fixed-shape arrays living on device:
one slot per live track, slot membership encoded in a ``state`` field.

State encoding (vs TrackState, demo:382-387):
  FREE    = 0   (no track; also where the reference's Removed tracks go —
                 the reference's removed_stracks list only serves its merge
                 set-algebra, which slot states make unnecessary)
  TRACKED = 1   (TrackState.Tracked; is_activated distinguishes the
                 reference's "unconfirmed" tracks)
  LOST    = 2   (TrackState.Lost; LongLost is dead code in the reference)

Feature history: the reference appends every ReID feature to a 300-deep
deque that nothing reads (demo:481,488). We keep an optional ring buffer
(config.feature_history > 0) for capability parity without paying HBM for
an unread buffer by default.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from botsort_tpu.config import TrackerConfig

FREE = 0
TRACKED = 1
LOST = 2


class TrackStore(NamedTuple):
    state: jnp.ndarray          # [N] int32
    is_activated: jnp.ndarray   # [N] bool
    track_id: jnp.ndarray       # [N] int32
    score: jnp.ndarray          # [N] f32
    frame_id: jnp.ndarray       # [N] int32 — frame of last update (end_frame)
    start_frame: jnp.ndarray    # [N] int32
    tracklet_len: jnp.ndarray   # [N] int32
    mean: jnp.ndarray           # [N, 8] f32 — (cx, cy, w, h, vcx, vcy, vw, vh)
    cov: jnp.ndarray            # [N, 4, 3] f32 — scalar-form covariance
    body_feat: jnp.ndarray      # [N, Db] f32 — current (raw) feature
    body_smooth: jnp.ndarray    # [N, Db] f32 — EMA-smoothed, normalized
    face_feat: jnp.ndarray      # [N, Df] f32
    face_smooth: jnp.ndarray    # [N, Df] f32
    det_index: jnp.ndarray      # [N] int32 — det slot matched this frame, -1
    next_id: jnp.ndarray        # [] int32 — BaseTrack._count equivalent
    frame_count: jnp.ndarray    # [] int32 — BoTSORT.frame_id equivalent
    body_hist: Optional[jnp.ndarray] = None  # [N, H, Db] ring buffer
    face_hist: Optional[jnp.ndarray] = None  # [N, H, Df]
    hist_pos: Optional[jnp.ndarray] = None   # [N] int32 write cursor


def empty_store(cfg: TrackerConfig) -> TrackStore:
    n = cfg.max_tracks
    db = cfg.body_feature_dim
    df = cfg.face_feature_dim
    h = cfg.feature_history
    return TrackStore(
        state=jnp.zeros((n,), jnp.int32),
        is_activated=jnp.zeros((n,), bool),
        track_id=jnp.zeros((n,), jnp.int32),
        score=jnp.zeros((n,), jnp.float32),
        frame_id=jnp.zeros((n,), jnp.int32),
        start_frame=jnp.zeros((n,), jnp.int32),
        tracklet_len=jnp.zeros((n,), jnp.int32),
        mean=jnp.zeros((n, 8), jnp.float32),
        cov=jnp.zeros((n, 4, 3), jnp.float32),
        body_feat=jnp.zeros((n, db), jnp.float32),
        body_smooth=jnp.zeros((n, db), jnp.float32),
        face_feat=jnp.zeros((n, df), jnp.float32),
        face_smooth=jnp.zeros((n, df), jnp.float32),
        det_index=jnp.full((n,), -1, jnp.int32),
        next_id=jnp.int32(0),
        frame_count=jnp.int32(0),
        body_hist=jnp.zeros((n, h, db), jnp.float32) if h > 0 else None,
        face_hist=jnp.zeros((n, h, df), jnp.float32) if h > 0 else None,
        hist_pos=jnp.zeros((n,), jnp.int32) if h > 0 else None,
    )
