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
    nms_clipped: jnp.ndarray    # [C] bool — NMS pre-top-k saturated
    tracks: TrackOutputs


def _compute_dtype(pipe_cfg: PipelineConfig):
    """Preprocess/interpolation dtype (PipelineConfig.compute_dtype).

    bfloat16 (default) runs the detector-input resize and the crop-resize
    contractions at the MXU bf16 rate with float32 accumulation — uint8
    pixels are exact in bfloat16, interpolation weights round at ~2^-9,
    and the networks consume bfloat16 anyway. "float32" restores
    bit-exact interpolation for oracle tests.
    """
    return jnp.dtype(pipe_cfg.compute_dtype)


def _crop(image, tlbr, out_hw, pdt, pipe_cfg):
    """ReID crop-resize dispatch: the int8-x-phase lowering on the
    production path (bf16 compute, uint8 frame — 2x MXU rate, <= ~1
    intensity level; ops/crop.py::crop_and_resize_int8), the exact
    einsum otherwise (float32 compute = oracle tests, float frames)."""
    if (pipe_cfg.crop_int8 and pdt == jnp.bfloat16
            and image.dtype == jnp.uint8):
        return crop.crop_and_resize_int8(image, tlbr, out_hw)
    return crop.crop_and_resize(image, tlbr, out_hw, compute_dtype=pdt)


def _det_width(tracker_cfg: TrackerConfig, nms_cfg: NMSConfig) -> int:
    """Tracker body-det slot count: every one of these is embedded by
    ReID and fed to association (the reference embeds ALL detections,
    demo:1452-1457; its TRT engines cover batch 1..100)."""
    return min(tracker_cfg.max_dets, nms_cfg.max_boxes_per_class)


def reid_bucket_set(tracker_cfg: TrackerConfig, nms_cfg: NMSConfig,
                    pipe_cfg: PipelineConfig) -> list[int]:
    """The static ReID bucket sizes the host dispatcher picks from
    (ascending): skip-entirely, the common small batch, a mid step, the
    det width. One compiled program per (body, face) bucket pair —
    cli/warmup.py pre-compiles them all.

    The top bucket is the det WIDTH d (the maximum possible live
    count), not the r-padded slot width dp: at the defaults d=50 slots
    pad to dp=64, and a 64-crop encoder batch would spend 22% of the
    frame's dominant stage embedding guaranteed-invalid slots. The 2r
    mid bucket ({0,16,32,50} at the defaults) keeps 17..2r-body scenes
    from paying the full-crowd encoder price (body ReID time is ~linear
    in the bucket, docs/PERF.md); the reference's equivalent is 100
    per-batch TensorRT engines (optimize_reid_tensorrt_engine.sh)."""
    d = _det_width(tracker_cfg, nms_cfg)
    r = pipe_cfg.max_reid_batch
    return sorted({0, min(r, d), min(2 * r, d), d})


def _pad_slots(arr: jnp.ndarray, dp: int, axis: int = 0,
               fill=0) -> jnp.ndarray:
    """Pad (or slice) `axis` to dp slots."""
    k = arr.shape[axis]
    if k >= dp:
        return jax.lax.slice_in_dim(arr, 0, dp, axis=axis)
    pad = [(0, 0, 0)] * arr.ndim
    pad[axis] = (0, dp - k, 0)
    return jax.lax.pad(arr, jnp.asarray(fill, arr.dtype), pad)


def _encode_chunked(encode, tlbr: jnp.ndarray, n_live: jnp.ndarray,
                    chunk: int, out_dim: int,
                    static_bucket: int | None = None) -> jnp.ndarray:
    """Embed crops for tlbr [Dp, 4] in `chunk`-sized pieces.

    Pieces whose slots lie entirely beyond n_live are skipped at runtime
    via lax.cond (valid det slots are a score-ordered prefix — see the
    compaction in ops/nms.py) and yield zero features, which the cascade
    never reads (every det-feature consumer is masked by det validity).
    This keeps ONE compiled program: sparse frames pay one chunk of
    encoder FLOPs, crowds scale in bucket steps — the TPU answer to the
    reference's 100 per-batch-size TensorRT engines
    (optimize_reid_tensorrt_engine.sh:19-21).

    Three buckets (SURVEY §7 step 4's power-of-2 plan): zero encoder
    work when nothing is live (empty scenes / no faces attached), the
    small `chunk` batch when the live count fits (the common case), the
    full padded width otherwise. ReID MFU rises steeply with batch on
    v5e (measured 20% at 16 vs 38% at 64, tools/perf_probe.py), so ONE
    big batch beats a scan of 16-wide chunks ~2x under crowd load while
    sparse scenes keep paying only the small batch. Exactly one branch
    executes per frame (lax.switch); slots beyond the selected bucket
    are zeros.

    static_bucket (compile-time, None = dynamic): measured on the v5e
    in this environment, a lax.cond/switch whose UNTAKEN branch holds a
    CNN costs nearly the branch's full execution time per step — the
    conditional's cost scales with the skipped branch's activation
    volume (tools/perf_probe stage bisection; a 64-crop ResNeSt branch
    adds ~6.5 ms while skipped). So the runtime bucket switch is only
    worth it when the big bucket actually runs. A caller that KNOWS the
    load — the host facade tracks last frame's live count and re-runs
    on overflow (pipeline/host.py), offline eval knows its scene —
    passes static_bucket to compile a branch-free program: 0 skips the
    encoder entirely, b <= dp encodes exactly b slots. The contract for
    exact parity with the dynamic path is static_bucket >= n_live
    (features of slots beyond n_live are never read: every det-feature
    consumer masks by det validity).
    """
    dp = tlbr.shape[0]

    def empty():
        return jnp.zeros((dp, out_dim), jnp.float32)

    if static_bucket is not None:
        b = min(static_bucket, dp)
        if b <= 0:
            return empty()
        if b >= dp:
            return encode(tlbr)
        return jnp.pad(encode(tlbr[:b]), ((0, dp - b), (0, 0)))
    if dp <= chunk:
        return jax.lax.cond(n_live > 0, lambda: encode(tlbr), empty)
    return jax.lax.switch(
        (n_live > 0).astype(jnp.int32) + (n_live > chunk).astype(jnp.int32),
        [empty,
         lambda: jnp.pad(encode(tlbr[:chunk]), ((0, dp - chunk), (0, 0))),
         lambda: encode(tlbr)])


def _encode_faces(encode, face_tlbr: jnp.ndarray, has_face: jnp.ndarray,
                  n_body_live: jnp.ndarray, chunk: int,
                  out_dim: int, static_bucket: int | None = None
                  ) -> jnp.ndarray:
    """Face embeddings with real-face compaction.

    The reference encodes a ZERO image for every faceless body and EMAs
    the resulting feature into the track (demo:1437-1441, 575-604,
    1486). encoder(zero crop) is one constant vector, so sorting real
    faces to a prefix lets the ReID bucket size track the FACE count
    instead of the body count; the constant is read from the first
    zero-crop pad slot of the selected bucket and broadcast to every
    faceless body slot. Exact reference semantics at a fraction of the
    encoder FLOPs (20 bodies with 5 faces: one 16-crop batch, not 64).

    static_bucket: see _encode_chunked. A bucket >= n_body_live is
    sufficient here too: n_face <= n_body_live, and when n_face <
    bucket the first pad slot (the encoder(0) source) falls inside it;
    when n_face == n_body_live there are no faceless LIVE bodies, so
    the broadcast constant only lands on invalid det slots, which the
    cascade never reads.
    """
    dp = face_tlbr.shape[0]
    order = jnp.argsort(jnp.logical_not(has_face), stable=True)
    inv = jnp.argsort(order)
    sorted_tlbr = face_tlbr[order]
    n_face = jnp.sum(has_face)
    # +1 keeps one zero-crop pad slot inside the selected bucket (the
    # encoder(0) source); gating on live bodies skips empty scenes.
    n_eff = jnp.where(n_body_live > 0, n_face + 1, 0)
    feats = _encode_chunked(encode, sorted_tlbr, n_eff, chunk, out_dim,
                            static_bucket=static_bucket)
    zcap = dp - 1 if static_bucket is None else \
        max(min(static_bucket, dp) - 1, 0)
    zero_feat = feats[jnp.minimum(n_face, zcap)]
    live = (jnp.arange(dp) < n_face)[:, None]
    return jnp.where(live, feats, zero_feat[None, :])[inv]


def _encode_faces_axis1(encode, face_tlbr: jnp.ndarray,
                        has_face: jnp.ndarray, n_body_live: jnp.ndarray,
                        chunk: int, out_dim: int,
                        static_bucket: int | None = None) -> jnp.ndarray:
    """_encode_faces over [B, Dp, 4] (per-stream compaction; one shared
    bucket sized by the max face count across streams)."""
    dp = face_tlbr.shape[1]
    order = jnp.argsort(jnp.logical_not(has_face), axis=1, stable=True)
    inv = jnp.argsort(order, axis=1)
    sorted_tlbr = jnp.take_along_axis(face_tlbr, order[..., None], axis=1)
    n_face = jnp.sum(has_face, axis=1)                        # [B]
    n_eff = jnp.where(n_body_live > 0, jnp.max(n_face) + 1, 0)
    feats = _encode_chunked_axis1(encode, sorted_tlbr, n_eff, chunk,
                                  out_dim, static_bucket=static_bucket)
    zcap = dp - 1 if static_bucket is None else \
        max(min(static_bucket, dp) - 1, 0)
    zero_feat = jnp.take_along_axis(
        feats, jnp.minimum(n_face, zcap)[:, None, None], axis=1)
    live = (jnp.arange(dp)[None, :] < n_face[:, None])[..., None]
    feats = jnp.where(live, feats, zero_feat)
    return jnp.take_along_axis(feats, inv[..., None], axis=1)


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
    static_argnames=("tracker_cfg", "nms_cfg", "pipe_cfg", "reid_bucket",
                      "face_bucket"),
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
    reid_bucket: int | None = None,
    face_bucket: int | None = None,
) -> Tuple[TrackStore, FrameResult]:
    """frame_bgr: [H, W, 3] uint8 (OpenCV layout). Returns updated store
    plus the per-frame readback. gmc_affine: optional host-estimated
    [2, 3] camera-motion matrix (io/gmc.py). reid_bucket: static crop
    budget for the body encoder (None = in-program dynamic bucketing;
    see _encode_chunked — exact iff reid_bucket >= live body count,
    which the host facade guarantees by re-running on overflow).
    face_bucket: ditto for the face encoder (defaults to reid_bucket;
    exact iff >= attached-face count + 1 when a faceless live body
    exists — the +1 holds the encoder(zero-crop) constant slot)."""
    src_h, src_w = frame_bgr.shape[0], frame_bgr.shape[1]
    in_h, in_w = pipe_cfg.detector_input_hw

    # --- Detector preprocess (demo:929-966): bilinear resize, raw BGR.
    # cv2.resize INTER_LINEAR semantics via the full-frame crop op:
    # jax.image.resize(method="linear") ANTIALIASES on downscale (a
    # different filter — up to ~150/255 off cv2 on 1080p->480x640);
    # ops/crop.py's 2-tap half-pixel form matches cv2 within 0.5
    # (tests/test_crop_hierarchy.py::test_crop_resize_matches_cv2).
    pdt = _compute_dtype(pipe_cfg)
    full = jnp.asarray(
        [[0.0, 0.0, float(src_w), float(src_h)]], jnp.float32)
    det_in = _crop(frame_bgr, full, (in_h, in_w), pdt, pipe_cfg)

    # --- Detect + NMS (in-graph for the reference, ours in ops/nms).
    cand_boxes, cand_scores = bundle.detector.apply(
        bundle.detector_params, det_in)
    dets = nms.multiclass_nms_dense(
        cand_boxes[0], cand_scores[0],
        iou_threshold=nms_cfg.iou_threshold,
        score_threshold=nms_cfg.score_threshold,
        max_per_class=nms_cfg.max_boxes_per_class,
        pre_nms_top_k=nms_cfg.pre_nms_top_k,
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

    # --- ReID crops: EVERY tracker det slot gets an embedding; encoding
    # runs in cond-gated chunks (see _encode_chunked).
    d = _det_width(tracker_cfg, nms_cfg)
    r = pipe_cfg.max_reid_batch
    dp = -(-d // r) * r
    body_tlbr_p = _pad_slots(det_boxes[bodies], dp)
    body_valid = det_valid[bodies][:d]
    n_live = jnp.sum(body_valid)

    def encode_body(tlbr_chunk):
        crops = _crop(frame_bgr, tlbr_chunk, pipe_cfg.body_reid_input_hw,
                      pdt, pipe_cfg)
        return bundle.body_encoder.apply(
            bundle.body_params, fastreid_mod.preprocess(crops))

    body_feats = _encode_chunked(
        encode_body, body_tlbr_p, n_live, r,
        tracker_cfg.body_feature_dim, static_bucket=reid_bucket)[:d]

    # Face crop per body: its head's face box; bodies without a face get
    # an all-zero crop (degenerate box), matching the reference's zero
    # image (demo:1437-1441).
    hb = _pad_slots(head_for_body, dp, fill=-1)
    fb = jnp.where(hb >= 0, face_for_head[jnp.clip(hb, 0, None)], -1)
    has_face = fb >= 0
    face_tlbr = jnp.where(
        has_face[:, None],
        det_boxes[faces][jnp.clip(fb, 0, None)],
        jnp.zeros((dp, 4), jnp.float32))

    def encode_face(tlbr_chunk):
        crops = _crop(frame_bgr, tlbr_chunk, pipe_cfg.face_reid_input_hw,
                      pdt, pipe_cfg)
        return bundle.face_encoder.apply(bundle.face_params, crops)

    face_feats = _encode_faces(
        encode_face, face_tlbr, has_face, n_live, r,
        tracker_cfg.face_feature_dim,
        static_bucket=reid_bucket if face_bucket is None
        else face_bucket)[:d]

    # --- Association cascade.
    store, tracks = tracker_update(
        store, det_boxes[bodies][:d], dets.scores[bodies][:d], body_valid,
        body_feats, face_feats, tracker_cfg, gmc_affine)

    result = FrameResult(
        det_boxes=det_boxes,
        det_scores=dets.scores,
        det_valid=det_valid,
        head_for_body=head_for_body,
        face_for_head=face_for_head,
        hand1_for_body=hand1_for_body,
        hand2_for_body=hand2_for_body,
        nms_clipped=dets.clipped,
        tracks=tracks,
    )
    return store, result


@functools.partial(
    jax.jit,
    static_argnames=("tracker_cfg", "nms_cfg", "pipe_cfg", "reid_bucket",
                      "face_bucket"),
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
    reid_bucket: int | None = None,
    face_bucket: int | None = None,
) -> Tuple[TrackStore, FrameResult]:
    """B independent streams batched through one chip.

    frames_bgr: [B, H, W, 3] uint8; stores: TrackStore with leading [B].

    Single-stream (batch-1) convolutions leave the MXU mostly idle —
    measured ~5.3 ms for the YOLOX-X forward at batch 1 vs ~1 ms/frame
    amortized at batch 4. The perception stages here run natively
    batched (detector batch B, both ReID encoders as ONE B*R crop batch
    per chunk, NMS/hierarchy/crops vmapped or flattened); the per-stream
    association cascades — tiny but stateful — run vmapped over the
    stream axis (program size flat in B). Tracker outputs are
    bitwise-identical to B single-stream runs (tests/test_batched_step
    and tests/test_multistream.py assert it). gmc_affines: optional
    [B, 2, 3] per-stream camera-motion matrices.
    """
    percep = _perception_batched(bundle, frames_bgr, tracker_cfg,
                                 nms_cfg, pipe_cfg, reid_bucket,
                                 face_bucket)
    (det_boxes, det_scores, det_valid, hier, nms_clipped, body_tlbr,
     body_scores, body_valid, body_feats, face_feats) = percep

    # Per-stream cascades, vmapped over the stream axis (one lockstep
    # program: compile time and program size flat in B; the JV solver's
    # while_loops batch via masked-select, so total sequential steps =
    # the max across streams, not the sum).
    if gmc_affines is None:
        stores_out, tracks = jax.vmap(
            lambda st, bt, bs, bv, bf, ff: tracker_update(
                st, bt, bs, bv, bf, ff, tracker_cfg)
        )(stores, body_tlbr, body_scores, body_valid, body_feats,
          face_feats)
    else:
        stores_out, tracks = jax.vmap(
            lambda st, bt, bs, bv, bf, ff, ga: tracker_update(
                st, bt, bs, bv, bf, ff, tracker_cfg, ga)
        )(stores, body_tlbr, body_scores, body_valid, body_feats,
          face_feats, gmc_affines)

    result = FrameResult(
        det_boxes=det_boxes,
        det_scores=det_scores,
        det_valid=det_valid,
        head_for_body=hier[0],
        face_for_head=hier[1],
        hand1_for_body=hier[2],
        hand2_for_body=hier[3],
        nms_clipped=nms_clipped,
        tracks=tracks,
    )
    return stores_out, result


def _perception_batched(bundle, frames_bgr, tracker_cfg, nms_cfg,
                        pipe_cfg, reid_bucket=None, face_bucket=None,
                        _truncate=None):
    """Everything before the cascade, batched over leading dim B.

    _truncate: debug/profiling hook (tools/perf_probe.py --stages
    batchedbisect): return early after the named level ("resize",
    "det", "nms", "hier", "bodyenc", "faceenc") with a small
    level-dependent array instead of the full tuple, so stage deltas
    can be timed in-context without duplicating this function.
    """
    b = frames_bgr.shape[0]
    src_h, src_w = frames_bgr.shape[1], frames_bgr.shape[2]
    in_h, in_w = pipe_cfg.detector_input_hw
    d = _det_width(tracker_cfg, nms_cfg)
    r = pipe_cfg.max_reid_batch
    dp = -(-d // r) * r
    bodies, heads, hands, faces = 0, 1, 2, 3

    pdt = _compute_dtype(pipe_cfg)
    # cv2-faithful 2-tap resize (see frame_step's preprocess comment).
    full = jnp.asarray(
        [[0.0, 0.0, float(src_w), float(src_h)]], jnp.float32)
    det_in = jax.vmap(
        lambda f: _crop(f, full, (in_h, in_w), pdt, pipe_cfg)[0]
    )(frames_bgr)
    if _truncate == "resize":
        return det_in[:, ::97, ::89, 0]

    cand_boxes, cand_scores = bundle.detector.apply(
        bundle.detector_params, det_in)
    if _truncate == "det":
        return cand_boxes[:, ::531, 0]

    def per_stream_nms(cb, cs):
        dets = nms.multiclass_nms_dense(
            cb, cs, iou_threshold=nms_cfg.iou_threshold,
            score_threshold=nms_cfg.score_threshold,
            max_per_class=nms_cfg.max_boxes_per_class,
            pre_nms_top_k=nms_cfg.pre_nms_top_k)
        boxes = _rescale_to_source(dets.boxes, (in_h, in_w),
                                   (src_h, src_w))
        valid = dets.valid & (dets.scores > tracker_cfg.det_score_threshold)
        return boxes, dets.scores, valid, dets.clipped

    det_boxes, det_scores, det_valid, nms_clipped = jax.vmap(
        per_stream_nms)(cand_boxes, cand_scores)       # [B, C, K, ...]
    if _truncate == "nms":
        return det_boxes[:, 0, :, 0]

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
    if _truncate == "hier":
        return jnp.stack([results[3 * s + 1][0] for s in range(b)])

    body_tlbr = det_boxes[:, bodies, :d]
    body_scores = det_scores[:, bodies, :d]
    body_valid = det_valid[:, bodies, :d]
    body_tlbr_p = _pad_slots(det_boxes[:, bodies], dp, axis=1)
    # A chunk executes iff ANY stream still has live slots there (valid
    # slots are a prefix per stream; streams share one program).
    n_live = jnp.max(jnp.sum(body_valid, axis=1))

    def encode_body(tlbr_chunk):                        # [B, rc, 4]
        rc = tlbr_chunk.shape[1]
        crops = jax.vmap(
            lambda f, bt: _crop(f, bt, pipe_cfg.body_reid_input_hw,
                                pdt, pipe_cfg)
        )(frames_bgr, tlbr_chunk)
        return bundle.body_encoder.apply(
            bundle.body_params,
            fastreid_mod.preprocess(
                crops.reshape((b * rc,) + crops.shape[2:]))
        ).reshape(b, rc, -1)

    body_feats = _encode_chunked_axis1(
        encode_body, body_tlbr_p, n_live, r,
        tracker_cfg.body_feature_dim, static_bucket=reid_bucket)[:, :d]
    if _truncate == "bodyenc":
        return body_feats[:, :, 0]

    face_tlbr_list = []
    has_face_list = []
    for s in range(b):
        hb = _pad_slots(results[3 * s + 1][0], dp, fill=-1)
        fb = jnp.where(hb >= 0, results[3 * s][0][jnp.clip(hb, 0, None)],
                       -1)
        has_face_list.append(fb >= 0)
        face_tlbr_list.append(jnp.where(
            (fb >= 0)[:, None],
            det_boxes[s, faces][jnp.clip(fb, 0, None)],
            jnp.zeros((dp, 4), jnp.float32)))
    face_tlbr = jnp.stack(face_tlbr_list)
    has_face_b = jnp.stack(has_face_list)

    def encode_face(tlbr_chunk):
        rc = tlbr_chunk.shape[1]
        crops = jax.vmap(
            lambda f, ft: _crop(f, ft, pipe_cfg.face_reid_input_hw,
                                pdt, pipe_cfg)
        )(frames_bgr, tlbr_chunk)
        return bundle.face_encoder.apply(
            bundle.face_params,
            crops.reshape((b * rc,) + crops.shape[2:])
        ).reshape(b, rc, -1)

    face_feats = _encode_faces_axis1(
        encode_face, face_tlbr, has_face_b, n_live, r,
        tracker_cfg.face_feature_dim,
        static_bucket=reid_bucket if face_bucket is None
        else face_bucket)[:, :d]
    if _truncate == "faceenc":
        return face_feats[:, :, 0]

    hier = (
        jnp.stack([results[3 * s + 1][0] for s in range(b)]),
        jnp.stack([results[3 * s][0] for s in range(b)]),
        jnp.stack([results[3 * s + 2][0] for s in range(b)]),
        jnp.stack([results[3 * s + 2][1] for s in range(b)]),
    )
    return (det_boxes, det_scores, det_valid, hier, nms_clipped,
            body_tlbr, body_scores, body_valid, body_feats, face_feats)


@functools.partial(
    jax.jit,
    static_argnames=("tracker_cfg", "nms_cfg", "pipe_cfg", "reid_bucket",
                      "face_bucket"),
    donate_argnames=("stores",),
)
def frame_step_batched_temporal(
    bundle: ModelBundle,
    stores: TrackStore,
    frames_bgr: jnp.ndarray,
    tracker_cfg: TrackerConfig,
    nms_cfg: NMSConfig,
    pipe_cfg: PipelineConfig,
    gmc_affines: jnp.ndarray | None = None,
    reid_bucket: int | None = None,
    face_bucket: int | None = None,
) -> Tuple[TrackStore, FrameResult]:
    """B streams x T consecutive frames each, in ONE dispatch.

    frames_bgr: [B, T, H, W, 3] uint8; stores: TrackStore with leading
    [B]; gmc_affines: optional [B, T, 2, 3].

    Perception (detector / NMS / hierarchy / crops / both encoders) runs
    batched over all B*T frames — detector batch B*T and up to B*T*r
    ReID crops per chunk, amortizing per-layer inefficiency beyond what
    batch B reaches — then the cascades run as T sequential steps of the
    same vmapped (lockstep-JV) tracker_update that frame_step_batched
    uses, chained through the per-stream stores. Output is
    bitwise-identical to T sequential frame_step_batched calls
    (tests/test_batched_step.py::test_temporal_batched_matches_sequential);
    the cost is T-1 frames of added latency per stream, which a serving
    loop trades against throughput (runtime/envelope.py records both
    operating points).
    """
    b, t = frames_bgr.shape[0], frames_bgr.shape[1]
    percep = _perception_batched(
        bundle, frames_bgr.reshape((b * t,) + frames_bgr.shape[2:]),
        tracker_cfg, nms_cfg, pipe_cfg, reid_bucket, face_bucket)
    (det_boxes, det_scores, det_valid, hier, nms_clipped, body_tlbr,
     body_scores, body_valid, body_feats, face_feats) = percep

    def to_tb(x):
        # [B*T, ...] -> [T, B, ...] (scan leading axis = time).
        return jnp.swapaxes(x.reshape((b, t) + x.shape[1:]), 0, 1)

    xs = tuple(to_tb(x) for x in
               (body_tlbr, body_scores, body_valid, body_feats,
                face_feats))
    if gmc_affines is not None:
        xs = xs + (jnp.swapaxes(gmc_affines, 0, 1),)

    def scan_body(st, per_t):
        if gmc_affines is None:
            bt, bs, bv, bf, ff = per_t
            st2, tr = jax.vmap(
                lambda s, a1, a2, a3, a4, a5: tracker_update(
                    s, a1, a2, a3, a4, a5, tracker_cfg)
            )(st, bt, bs, bv, bf, ff)
        else:
            bt, bs, bv, bf, ff, ga = per_t
            st2, tr = jax.vmap(
                lambda s, a1, a2, a3, a4, a5, g: tracker_update(
                    s, a1, a2, a3, a4, a5, tracker_cfg, g)
            )(st, bt, bs, bv, bf, ff, ga)
        return st2, tr

    stores_out, tracks = jax.lax.scan(scan_body, stores, xs)

    def to_bt(x):
        # [B*T, ...] -> [B, T, ...] for the per-frame readback fields.
        return x.reshape((b, t) + x.shape[1:])

    result = FrameResult(
        det_boxes=to_bt(det_boxes),
        det_scores=to_bt(det_scores),
        det_valid=to_bt(det_valid),
        head_for_body=to_bt(hier[0]),
        face_for_head=to_bt(hier[1]),
        hand1_for_body=to_bt(hier[2]),
        hand2_for_body=to_bt(hier[3]),
        nms_clipped=to_bt(nms_clipped),
        # tracks come out of the scan as [T, B, ...] -> [B, T, ...].
        tracks=jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), tracks),
    )
    return stores_out, result


def _encode_chunked_axis1(encode, tlbr: jnp.ndarray, n_live: jnp.ndarray,
                          chunk: int, out_dim: int,
                          static_bucket: int | None = None) -> jnp.ndarray:
    """_encode_chunked over [B, Dp, 4] boxes (buckets on axis 1)."""
    b, dp = tlbr.shape[0], tlbr.shape[1]

    def empty():
        return jnp.zeros((b, dp, out_dim), jnp.float32)

    if static_bucket is not None:
        sb = min(static_bucket, dp)
        if sb <= 0:
            return empty()
        if sb >= dp:
            return encode(tlbr)
        return jnp.pad(encode(tlbr[:, :sb]),
                       ((0, 0), (0, dp - sb), (0, 0)))
    if dp <= chunk:
        return jax.lax.cond(n_live > 0, lambda: encode(tlbr), empty)
    return jax.lax.switch(
        (n_live > 0).astype(jnp.int32) + (n_live > chunk).astype(jnp.int32),
        [empty,
         lambda: jnp.pad(encode(tlbr[:, :chunk]),
                         ((0, 0), (0, dp - chunk), (0, 0))),
         lambda: encode(tlbr)])


@functools.partial(
    jax.jit,
    static_argnames=("tracker_cfg", "nms_cfg", "pipe_cfg", "reid_bucket",
                      "face_bucket"),
    donate_argnames=("store",),
)
def frame_step_temporal(
    bundle: ModelBundle,
    store: TrackStore,
    frames_bgr: jnp.ndarray,
    tracker_cfg: TrackerConfig,
    nms_cfg: NMSConfig,
    pipe_cfg: PipelineConfig,
    reid_bucket: int | None = None,
    face_bucket: int | None = None,
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
    percep = _perception_batched(bundle, frames_bgr, tracker_cfg,
                                 nms_cfg, pipe_cfg, reid_bucket,
                                 face_bucket)
    (det_boxes, det_scores, det_valid, hier, nms_clipped, body_tlbr,
     body_scores, body_valid, body_feats, face_feats) = percep

    # The T cascades chain through the single store as a scan (program
    # size flat in T; output identical to T sequential tracker_updates).
    def scan_body(store, xs):
        bt, bs, bv, bf, ff = xs
        store, tr = tracker_update(store, bt, bs, bv, bf, ff, tracker_cfg)
        return store, tr

    store, tracks = jax.lax.scan(
        scan_body, store,
        (body_tlbr, body_scores, body_valid, body_feats, face_feats))
    result = FrameResult(
        det_boxes=det_boxes,
        det_scores=det_scores,
        det_valid=det_valid,
        head_for_body=hier[0],
        face_for_head=hier[1],
        hand1_for_body=hier[2],
        hand2_for_body=hier[3],
        nms_clipped=nms_clipped,
        tracks=tracks,
    )
    return store, result
