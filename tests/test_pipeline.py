"""End-to-end fused frame step on miniature models.

Uses randomly initialized mini architectures: detections are meaningless,
but the test verifies the full device program compiles and runs (resize,
detect, NMS, hierarchy, crops, both encoders, cascade), shapes/dtypes of
the readback, determinism, and that the host facade assembles a coherent
track list + box hierarchy.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
from botsort_tpu.pipeline.host import BoTSORTPipeline
from botsort_tpu.runtime.assets import build_bundle


@pytest.fixture(autouse=True, scope="module")
def _fresh_compile_state():
    # Same XLA:CPU JIT cliff as tests/test_static_bucket.py: compiling
    # this module's full-pipeline programs after the suite's hundreds
    # of live executables (the AOT-export tests alone add ~20)
    # segfaults in backend_compile / cache deserialize. Shedding JAX's
    # executable caches first keeps the process under the cliff.
    jax.clear_caches()

TRK = TrackerConfig(max_tracks=16, body_feature_dim=256,
                    face_feature_dim=256)
NMSC = NMSConfig(max_boxes_per_class=8, score_threshold=0.01)
PIPE = PipelineConfig(detector_input_hw=(96, 128),
                      body_reid_input_hw=(64, 32),
                      face_reid_input_hw=(32, 32),
                      max_reid_batch=4,
                      track_target_classes=(0, 1, 2, 3))


@pytest.fixture(scope="module")
def pipeline():
    bundle = build_bundle(mini=True)
    return BoTSORTPipeline(bundle, TRK, NMSC, PIPE)


def test_frame_step_runs_and_is_deterministic(pipeline):
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)

    pipeline.reset()
    tracks1 = [pipeline.update(frame) for _ in range(3)]
    pipeline.reset()
    tracks2 = [pipeline.update(frame) for _ in range(3)]

    for a, b in zip(tracks1, tracks2):
        assert len(a) == len(b)
        for ta, tb in zip(a, b):
            assert ta.track_id == tb.track_id
            np.testing.assert_allclose(ta.tlbr, tb.tlbr, rtol=1e-6)


def test_track_views_have_hierarchy_fields(pipeline):
    rng = np.random.default_rng(1)
    pipeline.reset()
    tracks = []
    for _ in range(4):
        frame = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
        tracks = pipeline.update(frame)
    for t in tracks:
        assert t.track_id >= 1
        assert t.tlbr.shape == (4,)
        assert t.tlwh.shape == (4,)
        if t.body is not None:
            assert t.body.trackid == t.track_id
            assert t.body.classid == 0
            if t.body.head is not None:
                assert t.body.head.trackid == t.track_id
                if t.body.head.face is not None:
                    assert t.body.head.face.trackid == t.track_id


def test_mixed_source_resolutions(pipeline):
    # A camera reconfiguration mid-stream: each (H, W) compiles its own
    # program variant; the tracker state carries across.
    rng = np.random.default_rng(3)
    pipeline.reset()
    pipeline.update(rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
    tracks = pipeline.update(
        rng.integers(0, 255, (240, 320, 3), dtype=np.uint8))
    assert isinstance(tracks, list)
    assert pipeline.frame_id == 2


def test_disable_reid_equals_bucket0(pipeline):
    """IoU-only mode (BASELINE config 1, demo --no_reid) must equal an
    explicit bucket-0 dispatch: zero features degenerate the
    reference's min(iou, masked-emb) fusion to IoU exactly."""
    import dataclasses

    from botsort_tpu.pipeline.frame_step import frame_step
    from botsort_tpu.track.state import empty_store

    no_reid = BoTSORTPipeline(
        pipeline.bundle, TRK, NMSC,
        dataclasses.replace(PIPE, disable_reid=True))
    store = empty_store(TRK)
    rng = np.random.default_rng(4)
    for _ in range(3):
        frame = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
        tracks = no_reid.update(frame)
        store, res = frame_step(pipeline.bundle, store,
                                jnp.asarray(frame), TRK, NMSC, PIPE,
                                None, 0, 0)
        ref_ids = np.asarray(res.tracks.track_id)[
            np.asarray(res.tracks.valid)]
        assert sorted(t.track_id for t in tracks) == \
            sorted(int(i) for i in ref_ids)


def test_lazy_package_exports():
    import botsort_tpu

    assert botsort_tpu.BoTSORTPipeline.__name__ == "BoTSORTPipeline"
    assert callable(botsort_tpu.build_bundle)


def test_slot_exhaustion_warning_fires_once(capsys):
    """dropped_new > 0 must surface a once-per-stream host warning (the
    reference has no slot limit; silent drops would be a parity hole —
    VERDICT r4 #8 'verify the warning fires')."""
    from botsort_tpu.pipeline.frame_step import FrameResult
    from botsort_tpu.pipeline.host import assemble_tracks
    from botsort_tpu.track.cascade import TrackOutputs

    k, n = 8, 4
    res = FrameResult(
        det_boxes=np.zeros((4, k, 4), np.float32),
        det_scores=np.zeros((4, k), np.float32),
        det_valid=np.zeros((4, k), bool),
        head_for_body=np.full((k,), -1, np.int32),
        face_for_head=np.full((k,), -1, np.int32),
        hand1_for_body=np.full((k,), -1, np.int32),
        hand2_for_body=np.full((k,), -1, np.int32),
        nms_clipped=np.zeros((4,), bool),
        tracks=TrackOutputs(
            valid=np.zeros((n,), bool),
            tlbr=np.zeros((n, 4), np.float32),
            track_id=np.zeros((n,), np.int32),
            score=np.zeros((n,), np.float32),
            det_index=np.full((n,), -1, np.int32),
            dropped_new=np.int32(2)),
    )
    warn_state = type("W", (), {})()
    assemble_tracks(res, TRK, NMSC, PIPE, warn_state=warn_state)
    err = capsys.readouterr().err
    assert "2 new track(s) dropped" in err and "max_tracks" in err
    # Once only per stream.
    assemble_tracks(res, TRK, NMSC, PIPE, warn_state=warn_state)
    assert "dropped" not in capsys.readouterr().err
