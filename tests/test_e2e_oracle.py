"""End-to-end numeric oracle through the fused frame step.

The cascade, NMS, hierarchy and crop each have unit oracles; this test
covers the SEAMS between them: the fused ``frame_step`` program
(decode -> NMS -> int-truncating rescale -> hierarchy attach -> crop-box
selection -> chunked ReID -> cascade) is compared, stage by stage and
end to end, against a composed numpy pipeline over multiple frames.

The detector forward and the ReID encoders are shared between the two
sides (they are networks, unit-tested elsewhere; identical inputs give
identical outputs) — everything in between (the reference's host-side
logic, demo_bottrack_onnx_tflite.py:968-1441) is recomputed in plain
numpy: greedy NMS, the demo:1009-1012 rescale truncation, greedy
hierarchy attachment with center tie-break, face-crop box selection, and
the full dynamic-list cascade (tests/oracle/botsort_np.py).
"""

# Compile-heavy integration module: full tier. The core tier
# (pytest -m 'not slow', <15 min cold) covers the same semantics
# via the cheap unit/oracle tests; run the full tier once per
# round (docs/TESTING.md).
import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
from botsort_tpu.models import fastreid as fastreid_mod
from botsort_tpu.ops import crop
from botsort_tpu.pipeline import frame_step as fs
from botsort_tpu.runtime.assets import build_bundle
from botsort_tpu.track.state import empty_store
from tests.oracle import boxes_np
from tests.oracle.botsort_np import NpBoTSORT
from tests.test_crop_hierarchy import np_greedy

TRK = TrackerConfig(
    max_tracks=16, body_feature_dim=256, face_feature_dim=256,
    det_score_threshold=0.05, track_high_thresh=0.22,
    track_low_thresh=0.05, new_track_thresh=0.24)
NMSC = NMSConfig(max_boxes_per_class=8, score_threshold=0.01)
PIPE = PipelineConfig(detector_input_hw=(96, 128),
                      body_reid_input_hw=(64, 32),
                      face_reid_input_hw=(32, 32),
                      max_reid_batch=4,
                      # Bit-exact interpolation for the oracle diff (the
                      # production default is bfloat16 — covered for
                      # tolerance in test_crop_hierarchy /
                      # test_pipeline).
                      compute_dtype="float32")
SRC_HW = (240, 320)


def np_nms_class(boxes, scores, nms_cfg):
    """Greedy NMS + rank-order compaction (ops/nms.py semantics =
    ONNX NonMaxSuppression)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        if scores[i] <= nms_cfg.score_threshold:
            continue
        if all(boxes_np.iou_single(boxes[i], boxes[j])
               <= nms_cfg.iou_threshold for j in keep):
            keep.append(i)
        if len(keep) >= nms_cfg.max_boxes_per_class:
            break
    return keep


def np_rescale(box, in_hw, src_hw):
    """demo:1009-1012: clamp to detector window, scale, truncate (in f32
    to match the device program bit-for-bit)."""
    in_h, in_w = in_hw
    src_h, src_w = src_hw
    b = box.astype(np.float32)
    x1 = np.floor(np.float32(max(np.float32(0.0), b[0]))
                  * np.float32(src_w / in_w))
    y1 = np.floor(np.float32(max(np.float32(0.0), b[1]))
                  * np.float32(src_h / in_h))
    x2 = np.floor(np.float32(min(b[2], np.float32(in_w)))
                  * np.float32(src_w / in_w))
    y2 = np.floor(np.float32(min(b[3], np.float32(in_h)))
                  * np.float32(src_h / in_h))
    return np.array([x1, y1, x2, y2], dtype=np.float32)


@pytest.fixture(scope="module")
def bundle():
    # float32 models: the oracle recomputes the decode / encoders in
    # separately-jitted programs, and bf16's fusion-dependent rounding
    # differs across programs by ~1e-2 — enough to flip NMS picks. In
    # f32 the cross-program drift is ~1e-6, far from every threshold.
    return build_bundle(mini=True, dtype=jnp.float32)


def oracle_perception(bundle, frame, nms_cfg, tracker_cfg, pipe_cfg):
    """Numpy NMS/rescale/hierarchy/crop-selection from the shared decode."""
    in_h, in_w = pipe_cfg.detector_input_hw
    frame_f = jnp.asarray(frame).astype(jnp.float32)
    # Same cv2-faithful full-frame crop-resize frame_step uses (the old
    # jax.image.resize antialiases on downscale — a different filter).
    src_h, src_w = frame.shape[0], frame.shape[1]
    full = jnp.asarray([[0.0, 0.0, float(src_w), float(src_h)]],
                       jnp.float32)
    det_in = crop.crop_and_resize(jnp.asarray(frame), full, (in_h, in_w),
                                  compute_dtype=jnp.float32)
    cand_boxes, cand_scores = jax.device_get(bundle.detector.apply(
        bundle.detector_params, det_in))
    cand_boxes, cand_scores = cand_boxes[0], cand_scores[0]

    k = nms_cfg.max_boxes_per_class
    det_boxes = np.zeros((4, k, 4), np.float32)
    det_scores = np.zeros((4, k), np.float32)
    det_valid = np.zeros((4, k), bool)
    for c in range(4):
        keep = np_nms_class(cand_boxes, cand_scores[:, c], nms_cfg)
        for slot, i in enumerate(keep):
            det_boxes[c, slot] = np_rescale(
                cand_boxes[i], (in_h, in_w), SRC_HW)
            det_scores[c, slot] = cand_scores[i, c]
            det_valid[c, slot] = (
                cand_scores[i, c] > tracker_cfg.det_score_threshold)

    bodies, heads, hands, faces = 0, 1, 2, 3
    (face_for_head,) = np_greedy(det_boxes[heads], det_boxes[faces],
                                 det_valid[heads], det_valid[faces])
    (head_for_body,) = np_greedy(det_boxes[bodies], det_boxes[heads],
                                 det_valid[bodies], det_valid[heads])
    hand1, hand2 = np_greedy(det_boxes[bodies], det_boxes[hands],
                             det_valid[bodies], det_valid[hands], rounds=2)
    return (frame_f, det_boxes, det_scores, det_valid,
            np.asarray(face_for_head), np.asarray(head_for_body),
            np.asarray(hand1), np.asarray(hand2))


def oracle_features(bundle, frame_f, det_boxes, det_valid, face_for_head,
                    head_for_body, tracker_cfg, pipe_cfg, nms_cfg):
    """Features via the SAME chunked device path frame_step uses, driven
    by the oracle's boxes (box equality is asserted separately, so any
    seam drift surfaces there, not here)."""
    d = fs._det_width(tracker_cfg, nms_cfg)
    r = pipe_cfg.max_reid_batch
    dp = -(-d // r) * r
    body_tlbr_p = fs._pad_slots(jnp.asarray(det_boxes[0]), dp)
    n_live = jnp.asarray(int(det_valid[0][:d].sum()), jnp.int32)

    def encode_body(tlbr_chunk):
        crops = crop.crop_and_resize(
            frame_f, tlbr_chunk, pipe_cfg.body_reid_input_hw)
        return bundle.body_encoder.apply(
            bundle.body_params, fastreid_mod.preprocess(crops))

    body_feats = fs._encode_chunked(
        encode_body, body_tlbr_p, n_live, r,
        tracker_cfg.body_feature_dim)[:d]

    hb = np.full((dp,), -1, np.int32)
    hb[:min(dp, len(head_for_body))] = head_for_body[:dp]
    fb = np.where(hb >= 0, face_for_head[np.clip(hb, 0, None)], -1)
    face_tlbr = np.where((fb >= 0)[:, None],
                         det_boxes[3][np.clip(fb, 0, None)],
                         np.zeros((dp, 4), np.float32))

    def encode_face(tlbr_chunk):
        crops = crop.crop_and_resize(
            frame_f, tlbr_chunk, pipe_cfg.face_reid_input_hw)
        return bundle.face_encoder.apply(bundle.face_params, crops)

    face_feats = fs._encode_faces(
        encode_face, jnp.asarray(face_tlbr), jnp.asarray(fb >= 0),
        n_live, r, tracker_cfg.face_feature_dim)[:d]
    return jax.device_get(body_feats), jax.device_get(face_feats)


def test_frame_step_matches_composed_numpy_pipeline(bundle):
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 255, SRC_HW + (3,), dtype=np.uint8)
              for _ in range(6)]

    store = empty_store(TRK)
    oracle = NpBoTSORT(high=TRK.track_high_thresh,
                       low=TRK.track_low_thresh,
                       new=TRK.new_track_thresh,
                       buffer=TRK.max_time_lost)
    d = fs._det_width(TRK, NMSC)
    saw_tracks = False

    for frame in frames:
        store, res = fs.frame_step(bundle, store, jnp.asarray(frame),
                                   TRK, NMSC, PIPE)
        res = jax.device_get(res)

        (frame_f, det_boxes, det_scores, det_valid, face_for_head,
         head_for_body, hand1, hand2) = oracle_perception(
            bundle, frame, NMSC, TRK, PIPE)

        # Seam 1: decode -> NMS -> int-truncating rescale.
        np.testing.assert_array_equal(np.asarray(res.det_valid), det_valid)
        np.testing.assert_allclose(np.asarray(res.det_scores), det_scores,
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(res.det_boxes), det_boxes)

        # Seam 2: rescaled boxes -> greedy hierarchy indices.
        np.testing.assert_array_equal(np.asarray(res.head_for_body),
                                      head_for_body)
        np.testing.assert_array_equal(np.asarray(res.face_for_head),
                                      face_for_head)
        np.testing.assert_array_equal(np.asarray(res.hand1_for_body), hand1)
        np.testing.assert_array_equal(np.asarray(res.hand2_for_body), hand2)

        # Seam 3: hierarchy -> crop boxes -> chunked encoders -> cascade.
        bf, ff = oracle_features(bundle, frame_f, det_boxes, det_valid,
                                 face_for_head, head_for_body, TRK, PIPE,
                                 NMSC)
        nv = int(det_valid[0][:d].sum())
        want = oracle.update(det_boxes[0][:nv], det_scores[0][:nv],
                             bf[:nv], ff[:nv])

        got = []
        t = res.tracks
        for s in range(len(t.valid)):
            if t.valid[s]:
                got.append((int(t.track_id[s]),
                            np.asarray(t.tlbr[s], np.float64),
                            float(t.score[s]), int(t.det_index[s])))
        got.sort(key=lambda x: x[0])
        want = sorted(want, key=lambda x: x[0])
        assert [g[0] for g in got] == [w[0] for w in want]
        assert [g[3] for g in got] == [w[3] for w in want]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g[1], w[1], atol=2e-2)
            np.testing.assert_allclose(g[2], w[2], atol=1e-5)
        saw_tracks = saw_tracks or len(got) > 0

    # The scenario must actually exercise the tracker (guards against
    # thresholds silently filtering everything out).
    assert saw_tracks
