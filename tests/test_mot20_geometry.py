"""The mot20_sbs_S50 384x128 body-ReID operating point (BASELINE
config 5). The reference pre-builds TensorRT engines for ReID input
heights 256..384 (optimize_reid_tensorrt_engine.sh:9-21) and demo.py
accepts the mot20 model name (-bfem, demo:1912-1923); here the geometry
is a PipelineConfig field parsed from the same names, and the full
pipeline runs at the 384x128 crop geometry with its own bucket set.
"""

import pytest

# Compile-heavy integration module: full tier. The core tier
# (pytest -m 'not slow', <15 min cold) covers the same semantics
# via the cheap unit/oracle tests; run the full tier once per
# round (docs/TESTING.md).
pytestmark = pytest.mark.slow

import numpy as np
import jax

from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
from botsort_tpu.pipeline.frame_step import frame_step, reid_bucket_set
from botsort_tpu.runtime import assets
from botsort_tpu.track.state import empty_store

MOT20_NAME = "mot20_sbs_S50_NMx3x384x128_post_feature_only.onnx"


def test_mot20_name_parses_384x128():
    assert assets.parse_body_reid_input_hw(MOT20_NAME) == (384, 128)
    # Default mot17 geometry unchanged.
    assert assets.parse_body_reid_input_hw(
        assets.DEFAULT_BODY_REID) == (256, 128)


def test_pipeline_runs_at_384x128_crop_geometry():
    """Full frame step with body crops at the mot20 384x128 geometry
    (mini encoder weights — geometry, bucketing, and crop plumbing are
    what is under test)."""
    bundle = assets.build_bundle(mini=True)
    tracker_cfg = TrackerConfig(
        max_tracks=16, body_feature_dim=256, face_feature_dim=256,
        det_score_threshold=0.01, track_high_thresh=0.05,
        track_low_thresh=0.01, new_track_thresh=0.05)
    nms_cfg = NMSConfig(max_boxes_per_class=8, score_threshold=0.01)
    pipe_cfg = PipelineConfig(
        detector_input_hw=(96, 128),
        body_reid_input_hw=(384, 128),       # the mot20 operating point
        face_reid_input_hw=(32, 32),
        max_reid_batch=4)

    buckets = reid_bucket_set(tracker_cfg, nms_cfg, pipe_cfg)
    assert buckets[0] == 0 and buckets[-1] >= 8

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
    store = empty_store(tracker_cfg)
    store, res = frame_step(bundle, store, frame, tracker_cfg, nms_cfg,
                            pipe_cfg, None, buckets[-1], buckets[-1])
    res = jax.device_get(res)
    assert np.isfinite(np.asarray(res.det_boxes)).all()
    assert res.tracks.valid.shape == (tracker_cfg.max_tracks,)

    # Geometry actually reaches the crop op: a 384x128 crop through the
    # mini encoder yields the configured feature dim, finite.
    from botsort_tpu.models import fastreid as fr
    from botsort_tpu.ops import crop

    crops = crop.crop_and_resize(
        jax.numpy.asarray(frame),
        jax.numpy.asarray([[10.0, 10.0, 100.0, 200.0]]),
        pipe_cfg.body_reid_input_hw)
    assert crops.shape == (1, 384, 128, 3)
    feats = bundle.body_encoder.apply(bundle.body_params,
                                      fr.preprocess(crops))
    assert feats.shape[-1] == 256 and np.isfinite(np.asarray(feats)).all()
