"""Configuration dataclasses for the tracker, NMS, and pipeline.

The reference hardcodes its tracker hyperparameters in ``BoTSORT.__init__``
(demo_bottrack_onnx_tflite.py:1268-1277) and bakes NMS parameters into the
ONNX graph (README.md:199-244, retuned offline via sam4onnx). Here both are
first-class config, since on TPU the NMS and cascade live in our own code.

All "MAX_*" fields are static shapes: TPU/XLA wants fixed shapes, so every
per-frame quantity (detections, tracks, crops) lives in padded slots with
validity masks. The semantics on valid entries are proven identical to the
reference's dynamic-shape math by the oracle tests in tests/.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class NMSConfig:
    """Detector post-process config.

    Defaults mirror the shipped reference detector ONNX
    ``yolox_x_..._post_1x3x480x640_score015_iou080_box050.onnx``:
    score threshold 0.15, NMS IoU threshold 0.80, max 50 boxes/class
    (the upstream generic defaults are 0.25/0.40/20 — README.md:199-207).
    """

    score_threshold: float = 0.15
    iou_threshold: float = 0.80
    max_boxes_per_class: int = 50
    num_classes: int = 4  # 0=body, 1=head, 2=hand, 3=face
    # Candidates entering the suppression sweep per class. The sweep is
    # exact when <= pre_nms_top_k candidates clear the score threshold;
    # beyond that the lowest-scoring overflow is dropped and the
    # Detections.clipped flag is set for the class (the reference's
    # in-graph NMS considers all boxes, so saturation is observable
    # rather than silent).
    pre_nms_top_k: int = 512


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """BoT-SORT association-cascade hyperparameters.

    Values mirror the reference's tuned settings
    (demo_bottrack_onnx_tflite.py:1268-1277); upstream BoT-SORT defaults in
    parentheses.
    """

    track_high_thresh: float = 0.40   # tracking confidence threshold (0.6)
    track_low_thresh: float = 0.10    # lowest score valid for tracks (0.1)
    new_track_thresh: float = 0.90    # new track activation thresh (0.7)
    match_thresh: float = 0.80        # lapjv cost limit, pass 1 (0.8)
    second_match_thresh: float = 0.50  # lapjv cost limit, pass 2 (hardcoded 0.5)
    unconfirmed_match_thresh: float = 0.70  # lapjv cost limit, pass 3 (0.7)
    track_buffer: int = 300           # frames to keep lost tracks (30)
    feature_history: int = 0          # ring-buffer depth for feature history.
    # The reference keeps a 300-deep deque (demo:481,488) that is appended to
    # but never read by the algorithm; we default the store to 0 (off) and
    # allocate the ring buffer only when >0.
    proximity_thresh: float = 0.50    # IoU-distance gate for ReID fusion
    appearance_thresh: float = 0.25   # cosine-distance gate for ReID fusion
    frame_rate: int = 30
    feature_ema_alpha: float = 0.90   # smooth-feature EMA (demo:473)
    det_score_threshold: float = 0.35  # YOLOX class_score_th (demo:746,862)
    # Fixed slot counts (static shapes).
    # 64 slots comfortably covers tracked+lost+unconfirmed for <=16
    # detections/frame (the assignment kernel's cost scales with the
    # padded width, so don't oversize; raise for crowded scenes).
    max_tracks: int = 64              # live (tracked+lost+unconfirmed) slots
    # Body-detection slots associated AND embedded per frame. The
    # effective tracker det width is min(max_dets, NMSConfig.
    # max_boxes_per_class) — with the defaults every NMS body survivor
    # reaches ReID + association (the reference embeds all detections,
    # demo:1452-1457, with TRT engines prebuilt for batch 1..100).
    max_dets: int = 50
    body_feature_dim: int = 2048      # FastReID SBS-S50 embedding dim
    face_feature_dim: int = 256       # face-reidentification-retail-0095 dim

    @property
    def buffer_size(self) -> int:
        # demo:1276 — int(frame_rate / 30.0 * track_buffer)
        return int(self.frame_rate / 30.0 * self.track_buffer)

    @property
    def max_time_lost(self) -> int:
        return self.buffer_size


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end pipeline config: model input geometry + batching."""

    detector_input_hw: Tuple[int, int] = (480, 640)   # demo:1902 (1x3x480x640)
    body_reid_input_hw: Tuple[int, int] = (256, 128)  # mot17_sbs_S50 NMx3x256x128
    face_reid_input_hw: Tuple[int, int] = (128, 128)  # retail-0095 NMx3x128x128
    # Compiled ReID chunk size — the TPU answer to the reference's 100
    # TensorRT engines for batch sizes 1..100 (optimize_reid_*.sh:19-21).
    # The frame step encodes up to TrackerConfig.max_dets crops in chunks
    # of this size; chunks entirely beyond the live-detection count are
    # skipped at runtime via lax.cond inside the ONE compiled program, so
    # sparse scenes pay for one chunk and crowds scale in chunk steps
    # (no per-count recompiles, no host round-trip to pick a bucket).
    max_reid_batch: int = 16
    # Compute dtype for the neural nets (tracker math stays float32).
    compute_dtype: str = "bfloat16"
    # Run the ReID crop-resize x-phase contraction on the int8 MXU (2x
    # the bf16 rate; ops/crop.py::crop_and_resize_int8). Exact integer
    # dequantization — the only approximation is rounding the 2-tap
    # interpolation weights to 1/127 steps: <= ~1 intensity level vs
    # the float32 path (the bf16 path is itself ~0.7). Applies only
    # when compute_dtype is bfloat16 and the source frame is uint8;
    # float32 compute (oracle parity tests) keeps exact interpolation.
    crop_int8: bool = True
    # Classes to emit in outputs/drawing (the README documents
    # -tc/--track_target_classes but the reference never implements it —
    # README.md:71,86-88; we do). Default matches the reference's
    # draw-everything behavior.
    track_target_classes: Tuple[int, ...] = (0, 1, 2, 3)
    # Camera-motion compensation (the reference's multi_gmc is dead code,
    # demo:1534-1536; we provide a working estimator — io/gmc.py).
    enable_gmc: bool = False
    # Host-side static ReID bucket dispatch (pipeline/host.py): the live
    # loop picks a branch-free compiled bucket from the last frame's
    # detection count instead of the in-program lax.switch — measured on
    # v5e, a conditional whose UNTAKEN branch holds a CNN costs nearly
    # the branch's execution time (docs/PERF.md), so sparse scenes were
    # paying the 64-crop ReID price with zero people in frame. Exact:
    # frames whose count overflows the chosen bucket re-run with the
    # next one (encoder outputs are batch-size invariant per sample).
    host_bucket_dispatch: bool = True
    # IoU-only association (BASELINE config 1): skip both ReID encoders
    # by pinning the host dispatch to bucket 0 (zero features). Exact
    # IoU-only math falls out of the reference's own cost fusion:
    # dists = min(iou_dist, masked emb_dist) (demo:1538-1556), and with
    # zero features every emb_dist is 1.0 and masked to the ceiling, so
    # min(iou, 1) == iou. No separate cascade code path needed.
    disable_reid: bool = False


DEFAULT_NMS = NMSConfig()
DEFAULT_TRACKER = TrackerConfig()
DEFAULT_PIPELINE = PipelineConfig()
