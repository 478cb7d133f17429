"""Batched multi-video surface: BatchedBoTSORTPipeline equivalence with
single-stream pipelines, and the cli/multitrack.py smoke path."""

# Compile-heavy integration module: full tier. The core tier
# (pytest -m 'not slow', <15 min cold) covers the same semantics
# via the cheap unit/oracle tests; run the full tier once per
# round (docs/TESTING.md).
import pytest

pytestmark = pytest.mark.slow

import os

import cv2
import numpy as np
import pytest

from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
from botsort_tpu.runtime.assets import build_bundle
from tests.test_cli import make_video

TRK = TrackerConfig(max_tracks=16, body_feature_dim=256,
                    face_feature_dim=256, det_score_threshold=0.05,
                    track_high_thresh=0.22, track_low_thresh=0.05,
                    new_track_thresh=0.24)
NMSC = NMSConfig(max_boxes_per_class=8, score_threshold=0.01)
PIPE = PipelineConfig(detector_input_hw=(96, 128),
                      body_reid_input_hw=(64, 32),
                      face_reid_input_hw=(32, 32), max_reid_batch=4)


@pytest.fixture(scope="module")
def bundle():
    return build_bundle(mini=True)


def test_batched_pipeline_matches_single(bundle):
    from botsort_tpu.pipeline.host import (
        BatchedBoTSORTPipeline,
        BoTSORTPipeline,
    )

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (3, 2, 120, 160, 3), dtype=np.uint8)

    batched = BatchedBoTSORTPipeline(bundle, 2, TRK, NMSC, PIPE)
    singles = [BoTSORTPipeline(bundle, TRK, NMSC, PIPE) for _ in range(2)]

    for t in range(frames.shape[0]):
        got = batched.update(frames[t])
        for s in range(2):
            want = singles[s].update(frames[t, s])
            assert [v.track_id for v in got[s]] == \
                   [v.track_id for v in want]
            for g, w in zip(got[s], want):
                np.testing.assert_allclose(g.tlbr, w.tlbr, atol=1e-4)
                assert (g.body is None) == (w.body is None)


def test_batched_pipeline_wrong_count(bundle):
    from botsort_tpu.pipeline.host import BatchedBoTSORTPipeline

    p = BatchedBoTSORTPipeline(bundle, 2, TRK, NMSC, PIPE)
    with pytest.raises(ValueError):
        p.update(np.zeros((3, 120, 160, 3), np.uint8))


def test_multitrack_cli(tmp_path, monkeypatch):
    from botsort_tpu.cli import multitrack

    v1 = make_video(str(tmp_path / "a.mp4"))
    v2 = make_video(str(tmp_path / "b.mp4"))
    monkeypatch.chdir(tmp_path)
    rc = multitrack.main([
        "-v", v1, v2, "--mini", "--max_frames", "3",
        "--output_dir", str(tmp_path), "-ep", "cpu",
    ])
    assert rc == 0
    for stem in ("a", "b"):
        out = str(tmp_path / f"{stem}_tracked.mp4")
        assert os.path.exists(out)
        cap = cv2.VideoCapture(out)
        assert cap.get(cv2.CAP_PROP_FRAME_COUNT) >= 3
        cap.release()


def test_multitrack_cli_missing_video(tmp_path):
    from botsort_tpu.cli import multitrack

    rc = multitrack.main(["-v", str(tmp_path / "nope.mp4"), "--mini"])
    assert rc == 1


def test_temporal_pipeline_matches_manual_step(bundle):
    """TemporalBatchedBoTSORTPipeline must assemble exactly what
    frame_step_batched_temporal computes — this locks the FACADE (group
    reshape, time-major [t][s] assembly, store chaining) against
    manually-driven steps at the identical batch shape.

    Cross-BATCH-size equality (temporal vs frame-at-a-time) is the step
    test's contract (tests/test_batched_step.py::
    test_temporal_batched_matches_sequential); it cannot be asserted
    through the host facades in general because a batch-B*T conv is not
    float-stable vs batch-B under this backend's threading, and
    random-init detections amplify near-tie NMS/match flips into
    different tracks (observed under the 8-virtual-device conftest)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from botsort_tpu.pipeline.frame_step import frame_step_batched_temporal
    from botsort_tpu.pipeline.host import (
        TemporalBatchedBoTSORTPipeline,
        assemble_tracks,
    )
    from botsort_tpu.track.state import empty_store

    pipe = dataclasses.replace(PIPE, host_bucket_dispatch=False)
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 255, (4, 2, 120, 160, 3), dtype=np.uint8)

    temporal = TemporalBatchedBoTSORTPipeline(
        bundle, 2, t_batch=2, tracker_cfg=TRK, nms_cfg=NMSC,
        pipe_cfg=pipe)
    stores = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (2,) + x.shape), empty_store(TRK))

    for g in range(frames.shape[0] // 2):
        # [B, T, H, W, 3] group = frames 2g, 2g+1.
        grp = np.stack([frames[2 * g:2 * g + 2, s] for s in range(2)])
        got_t = temporal.update(grp)
        assert len(got_t) == 2  # time-major

        stores, res = frame_step_batched_temporal(
            bundle, stores, jnp.asarray(grp), TRK, NMSC, pipe)
        res_h = jax.device_get(res)
        for tt in range(2):
            for s in range(2):
                want = assemble_tracks(
                    jax.tree.map(lambda x: x[s][tt], res_h),
                    TRK, NMSC, pipe)
                assert [v.track_id for v in got_t[tt][s]] == \
                       [v.track_id for v in want]
                for gv, wv in zip(got_t[tt][s], want):
                    np.testing.assert_array_equal(gv.tlbr, wv.tlbr)


def test_multitrack_cli_temporal(tmp_path, monkeypatch):
    from botsort_tpu.cli import multitrack

    v1 = make_video(str(tmp_path / "a.mp4"))
    v2 = make_video(str(tmp_path / "b.mp4"))
    monkeypatch.chdir(tmp_path)
    rc = multitrack.main([
        "-v", v1, v2, "--mini", "--max_frames", "4", "--temporal", "2",
        "--output_dir", str(tmp_path), "-ep", "cpu",
    ])
    assert rc == 0
    for stem in ("a", "b"):
        out = str(tmp_path / f"{stem}_tracked.mp4")
        assert os.path.exists(out)
        cap = cv2.VideoCapture(out)
        assert cap.get(cv2.CAP_PROP_FRAME_COUNT) >= 4
        cap.release()
