"""The fused per-frame device program.

The reference's per-frame loop makes 3 host->GPU inference round-trips
with host-side numpy between them (SURVEY.md §3.2): detector, body ReID,
face ReID, plus host NMS-output filtering, Python IoU loops, and three
C++ lapjv calls. Here the ENTIRE frame step is one jitted function:

  uint8 frame -> resize/normalize -> YOLOX -> NMS -> rescale ->
  hierarchy attach -> crop+resize ReID batches -> both encoders ->
  association cascade -> track store update

One host->device transfer (the frame) and one small readback (the
FrameResult pytree) per frame. All shapes static.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
from botsort_tpu.models import FaceReID, FastReIDSBS, YOLOX
from botsort_tpu.models import fastreid as fastreid_mod
from botsort_tpu.ops import crop, hierarchy, nms
from botsort_tpu.track.cascade import TrackOutputs, tracker_update
from botsort_tpu.track.state import TrackStore


class FrameResult(NamedTuple):
    """Everything the host needs per frame (single small readback).

    Detections are per-class padded slots (class 0=body, 1=head, 2=hand,
    3=face), boxes in source-image integer pixel coords (the reference
    truncates to int at rescale, demo:1009-1012).
    """

    det_boxes: jnp.ndarray      # [C, K, 4] float32 (integer-valued)
    det_scores: jnp.ndarray     # [C, K]
    det_valid: jnp.ndarray      # [C, K] bool
    head_for_body: jnp.ndarray  # [Db] int32 head det slot or -1
    face_for_head: jnp.ndarray  # [Kh] int32 face det slot or -1
    hand1_for_body: jnp.ndarray  # [Db] int32
    hand2_for_body: jnp.ndarray  # [Db] int32
    tracks: TrackOutputs


@jax.tree_util.register_pytree_node_class
class ModelBundle:
    """Models + params for the three networks.

    A custom pytree: the three param trees are children (traced under
    jit), the three Module definitions are static aux data (flax linen
    Modules are frozen dataclasses — hashable, so jit caches on the
    architecture).
    """

    def __init__(self, detector: YOLOX, detector_params: Any,
                 body_encoder: FastReIDSBS, body_params: Any,
                 face_encoder: FaceReID, face_params: Any):
        self.detector = detector
        self.detector_params = detector_params
        self.body_encoder = body_encoder
        self.body_params = body_params
        self.face_encoder = face_encoder
        self.face_params = face_params

    def tree_flatten(self):
        children = (self.detector_params, self.body_params,
                    self.face_params)
        aux = (self.detector, self.body_encoder, self.face_encoder)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        detector, body_encoder, face_encoder = aux
        detector_params, body_params, face_params = children
        return cls(detector, detector_params, body_encoder, body_params,
                   face_encoder, face_params)


def _rescale_to_source(boxes: jnp.ndarray, in_hw, src_hw) -> jnp.ndarray:
    """Detector-input coords -> source-image integer coords.

    Replicates demo:1009-1012: clamp to the detector input window, scale,
    truncate to int.
    """
    in_h, in_w = in_hw
    src_h, src_w = src_hw
    x1 = jnp.floor(jnp.maximum(0.0, boxes[..., 0]) * (src_w / in_w))
    y1 = jnp.floor(jnp.maximum(0.0, boxes[..., 1]) * (src_h / in_h))
    x2 = jnp.floor(jnp.minimum(boxes[..., 2], in_w) * (src_w / in_w))
    y2 = jnp.floor(jnp.minimum(boxes[..., 3], in_h) * (src_h / in_h))
    return jnp.stack([x1, y1, x2, y2], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("tracker_cfg", "nms_cfg", "pipe_cfg"),
    donate_argnames=("store",),
)
def frame_step(
    bundle: ModelBundle,
    store: TrackStore,
    frame_bgr: jnp.ndarray,
    tracker_cfg: TrackerConfig,
    nms_cfg: NMSConfig,
    pipe_cfg: PipelineConfig,
    gmc_affine: jnp.ndarray | None = None,
) -> Tuple[TrackStore, FrameResult]:
    """frame_bgr: [H, W, 3] uint8 (OpenCV layout). Returns updated store
    plus the per-frame readback. gmc_affine: optional host-estimated
    [2, 3] camera-motion matrix (io/gmc.py)."""
    src_h, src_w = frame_bgr.shape[0], frame_bgr.shape[1]
    in_h, in_w = pipe_cfg.detector_input_hw

    # --- Detector preprocess (demo:929-966): bilinear resize, raw BGR.
    frame_f = frame_bgr.astype(jnp.float32)
    det_in = jax.image.resize(frame_f, (in_h, in_w, 3), method="linear")
    det_in = det_in[None]

    # --- Detect + NMS (in-graph for the reference, ours in ops/nms).
    cand_boxes, cand_scores = bundle.detector.apply(
        bundle.detector_params, det_in)
    dets = nms.multiclass_nms_dense(
        cand_boxes[0], cand_scores[0],
        iou_threshold=nms_cfg.iou_threshold,
        score_threshold=nms_cfg.score_threshold,
        max_per_class=nms_cfg.max_boxes_per_class,
    )
    det_boxes = _rescale_to_source(dets.boxes, (in_h, in_w), (src_h, src_w))
    # Detector wrapper score filter (strict >, demo:1003).
    det_valid = dets.valid & (dets.scores > tracker_cfg.det_score_threshold)

    bodies, heads, hands, faces = 0, 1, 2, 3
    # --- Box hierarchy (demo:1372-1411): faces->heads, heads->bodies,
    # hands->bodies (two rounds, interleaved per body). The three
    # problems touch disjoint target sets, so they run in one batched
    # scan (sequential steps are the costly unit on TPU).
    results = hierarchy.greedy_assign_batch([
        (det_boxes[heads], det_valid[heads],
         det_boxes[faces], det_valid[faces], 1),
        (det_boxes[bodies], det_valid[bodies],
         det_boxes[heads], det_valid[heads], 1),
        (det_boxes[bodies], det_valid[bodies],
         det_boxes[hands], det_valid[hands], 2),
    ])
    (face_for_head,) = results[0]
    (head_for_body,) = results[1]
    hand1_for_body, hand2_for_body = results[2]

    # --- ReID crops for the first R body slots (score-ordered by NMS).
    r = pipe_cfg.max_reid_batch
    body_tlbr = det_boxes[bodies][:r]
    body_scores = dets.scores[bodies][:r]
    body_valid = det_valid[bodies][:r]

    body_crops = crop.crop_and_resize(
        frame_f, body_tlbr, pipe_cfg.body_reid_input_hw)
    body_feats = bundle.body_encoder.apply(
        bundle.body_params, fastreid_mod.preprocess(body_crops))

    # Face crop per body: its head's face box; bodies without a face get
    # an all-zero crop (degenerate box), matching the reference's zero
    # image (demo:1437-1441).
    hb = head_for_body[:r]
    fb = jnp.where(hb >= 0, face_for_head[jnp.clip(hb, 0, None)], -1)
    has_face = fb >= 0
    face_tlbr = jnp.where(
        has_face[:, None],
        det_boxes[faces][jnp.clip(fb, 0, None)],
        jnp.zeros((r, 4), jnp.float32))
    face_crops = crop.crop_and_resize(
        frame_f, face_tlbr, pipe_cfg.face_reid_input_hw)
    face_feats = bundle.face_encoder.apply(bundle.face_params, face_crops)

    # --- Association cascade.
    store, tracks = tracker_update(
        store, body_tlbr, body_scores, body_valid, body_feats, face_feats,
        tracker_cfg, gmc_affine)

    result = FrameResult(
        det_boxes=det_boxes,
        det_scores=dets.scores,
        det_valid=det_valid,
        head_for_body=head_for_body,
        face_for_head=face_for_head,
        hand1_for_body=hand1_for_body,
        hand2_for_body=hand2_for_body,
        tracks=tracks,
    )
    return store, result


@functools.partial(
    jax.jit,
    static_argnames=("tracker_cfg", "nms_cfg", "pipe_cfg"),
    donate_argnames=("stores",),
)
def frame_step_batched(
    bundle: ModelBundle,
    stores: TrackStore,
    frames_bgr: jnp.ndarray,
    tracker_cfg: TrackerConfig,
    nms_cfg: NMSConfig,
    pipe_cfg: PipelineConfig,
    gmc_affines: jnp.ndarray | None = None,
) -> Tuple[TrackStore, FrameResult]:
    """B independent streams batched through one chip.

    frames_bgr: [B, H, W, 3] uint8; stores: TrackStore with leading [B].

    Single-stream (batch-1) convolutions leave the MXU mostly idle —
    measured ~5.3 ms for the YOLOX-X forward at batch 1 vs ~1 ms/frame
    amortized at batch 4. The perception stages here run natively
    batched (detector batch B, both ReID encoders as ONE B*R crop
    batch, NMS/hierarchy/crops vmapped or flattened); the per-stream
    association cascades — tiny (~0.1 ms) but stateful — run unrolled.
    Tracker outputs are bitwise-identical to B single-stream runs
    (tests/test_multistream.py covers the sharded variant; the batched
    cascade is the same tracker_update per slice). gmc_affines: optional
    [B, 2, 3] per-stream camera-motion matrices.
    """
    percep = _perception_batched(bundle, frames_bgr, tracker_cfg,
                                 nms_cfg, pipe_cfg)
    (det_boxes, det_scores, det_valid, hier, body_tlbr, body_scores,
     body_valid, body_feats, face_feats) = percep
    b = frames_bgr.shape[0]

    # Per-stream cascades (stateful, tiny) — unrolled.
    new_stores, tracks_list = [], []
    for s in range(b):
        store_s = jax.tree.map(lambda x: x[s], stores)
        store_s, tr = tracker_update(
            store_s, body_tlbr[s], body_scores[s], body_valid[s],
            body_feats[s], face_feats[s], tracker_cfg,
            None if gmc_affines is None else gmc_affines[s])
        new_stores.append(store_s)
        tracks_list.append(tr)

    stores_out = jax.tree.map(lambda *xs: jnp.stack(xs), *new_stores)
    tracks = jax.tree.map(lambda *xs: jnp.stack(xs), *tracks_list)
    result = FrameResult(
        det_boxes=det_boxes,
        det_scores=det_scores,
        det_valid=det_valid,
        head_for_body=hier[0],
        face_for_head=hier[1],
        hand1_for_body=hier[2],
        hand2_for_body=hier[3],
        tracks=tracks,
    )
    return stores_out, result


def _perception_batched(bundle, frames_bgr, tracker_cfg, nms_cfg,
                        pipe_cfg):
    """Everything before the cascade, batched over leading dim B."""
    b = frames_bgr.shape[0]
    src_h, src_w = frames_bgr.shape[1], frames_bgr.shape[2]
    in_h, in_w = pipe_cfg.detector_input_hw
    r = pipe_cfg.max_reid_batch
    bodies, heads, hands, faces = 0, 1, 2, 3

    frames_f = frames_bgr.astype(jnp.float32)
    det_in = jax.vmap(
        lambda f: jax.image.resize(f, (in_h, in_w, 3), method="linear")
    )(frames_f)

    cand_boxes, cand_scores = bundle.detector.apply(
        bundle.detector_params, det_in)

    def per_stream_nms(cb, cs):
        dets = nms.multiclass_nms_dense(
            cb, cs, iou_threshold=nms_cfg.iou_threshold,
            score_threshold=nms_cfg.score_threshold,
            max_per_class=nms_cfg.max_boxes_per_class)
        boxes = _rescale_to_source(dets.boxes, (in_h, in_w),
                                   (src_h, src_w))
        valid = dets.valid & (dets.scores > tracker_cfg.det_score_threshold)
        return boxes, dets.scores, valid

    det_boxes, det_scores, det_valid = jax.vmap(per_stream_nms)(
        cand_boxes, cand_scores)                       # [B, C, K, ...]

    # Hierarchy: 3 problems per stream -> one 3B-problem lockstep scan.
    problems = []
    for s in range(b):
        problems += [
            (det_boxes[s, heads], det_valid[s, heads],
             det_boxes[s, faces], det_valid[s, faces], 1),
            (det_boxes[s, bodies], det_valid[s, bodies],
             det_boxes[s, heads], det_valid[s, heads], 1),
            (det_boxes[s, bodies], det_valid[s, bodies],
             det_boxes[s, hands], det_valid[s, hands], 2),
        ]
    results = hierarchy.greedy_assign_batch(problems)

    body_tlbr = det_boxes[:, bodies, :r]
    body_scores = det_scores[:, bodies, :r]
    body_valid = det_valid[:, bodies, :r]

    body_crops = jax.vmap(
        lambda f, bt: crop.crop_and_resize(
            f, bt, pipe_cfg.body_reid_input_hw))(frames_f, body_tlbr)
    body_feats = bundle.body_encoder.apply(
        bundle.body_params,
        fastreid_mod.preprocess(
            body_crops.reshape((b * r,) + body_crops.shape[2:]))
    ).reshape(b, r, -1)

    face_tlbr_list = []
    for s in range(b):
        hb = results[3 * s + 1][0][:r]
        fb = jnp.where(hb >= 0, results[3 * s][0][jnp.clip(hb, 0, None)],
                       -1)
        face_tlbr_list.append(jnp.where(
            (fb >= 0)[:, None],
            det_boxes[s, faces][jnp.clip(fb, 0, None)],
            jnp.zeros((r, 4), jnp.float32)))
    face_tlbr = jnp.stack(face_tlbr_list)
    face_crops = jax.vmap(
        lambda f, ft: crop.crop_and_resize(
            f, ft, pipe_cfg.face_reid_input_hw))(frames_f, face_tlbr)
    face_feats = bundle.face_encoder.apply(
        bundle.face_params,
        face_crops.reshape((b * r,) + face_crops.shape[2:])
    ).reshape(b, r, -1)

    hier = (
        jnp.stack([results[3 * s + 1][0] for s in range(b)]),
        jnp.stack([results[3 * s][0] for s in range(b)]),
        jnp.stack([results[3 * s + 2][0] for s in range(b)]),
        jnp.stack([results[3 * s + 2][1] for s in range(b)]),
    )
    return (det_boxes, det_scores, det_valid, hier, body_tlbr,
            body_scores, body_valid, body_feats, face_feats)


@functools.partial(
    jax.jit,
    static_argnames=("tracker_cfg", "nms_cfg", "pipe_cfg"),
    donate_argnames=("store",),
)
def frame_step_temporal(
    bundle: ModelBundle,
    store: TrackStore,
    frames_bgr: jnp.ndarray,
    tracker_cfg: TrackerConfig,
    nms_cfg: NMSConfig,
    pipe_cfg: PipelineConfig,
) -> Tuple[TrackStore, FrameResult]:
    """T consecutive frames of ONE stream in one dispatch.

    frames_bgr: [T, H, W, 3]. Detection / NMS / hierarchy / crops / ReID
    run batched over the T frames (amortizing the batch-1 MXU
    under-utilization exactly like frame_step_batched); the T cascades
    then run chained through the single store — output identical to T
    sequential frame_step calls. Adds T-1 frames of latency: intended
    for offline workloads (trace export, MOT evaluation), not live
    camera loops.
    """
    t_len = frames_bgr.shape[0]
    percep = _perception_batched(bundle, frames_bgr, tracker_cfg,
                                 nms_cfg, pipe_cfg)
    (det_boxes, det_scores, det_valid, hier, body_tlbr, body_scores,
     body_valid, body_feats, face_feats) = percep

    tracks_list = []
    for t in range(t_len):
        store, tr = tracker_update(
            store, body_tlbr[t], body_scores[t], body_valid[t],
            body_feats[t], face_feats[t], tracker_cfg)
        tracks_list.append(tr)

    tracks = jax.tree.map(lambda *xs: jnp.stack(xs), *tracks_list)
    result = FrameResult(
        det_boxes=det_boxes,
        det_scores=det_scores,
        det_valid=det_valid,
        head_for_body=hier[0],
        face_for_head=hier[1],
        hand1_for_body=hier[2],
        hand2_for_body=hier[3],
        tracks=tracks,
    )
    return store, result
