"""Static ReID bucket dispatch (frame_step reid_bucket= / host picker).

On the v5e an in-program lax.switch whose untaken branch holds a CNN
costs nearly the branch's full execution time (docs/PERF.md), so the
host facade picks a branch-free compiled bucket from the previous
frame's live count and re-runs on overflow. These tests pin the
exactness contract: bucket >= n_live gives outputs identical to the
dynamic path, and the host dispatcher (including its overflow re-run)
matches a dynamic-path pipeline frame for frame.
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
from botsort_tpu.pipeline import frame_step as fs
from botsort_tpu.pipeline.host import BoTSORTPipeline
from botsort_tpu.runtime.assets import build_bundle
from botsort_tpu.track.state import empty_store

TRK = TrackerConfig(max_tracks=16, body_feature_dim=256,
                    face_feature_dim=256, det_score_threshold=0.05,
                    track_high_thresh=0.22, track_low_thresh=0.05,
                    new_track_thresh=0.24)
NMSC = NMSConfig(max_boxes_per_class=8, score_threshold=0.01)
PIPE = PipelineConfig(detector_input_hw=(96, 128),
                      body_reid_input_hw=(64, 32),
                      face_reid_input_hw=(32, 32), max_reid_batch=4)
# det width d = min(max_dets, 8) = 8, dp = 8, chunk = 4 -> dynamic path
# uses the 3-way switch; static buckets {0, 4, 8}.


@pytest.fixture(autouse=True, scope="module")
def _fresh_compile_state():
    # XLA:CPU's JIT segfaults compiling this module's batched-dispatch
    # programs late in the full suite (hundreds of live executables;
    # crash is in backend_compile_and_load, passes in isolation —
    # a compiler resource cliff, not a math issue). Dropping JAX's
    # executable/tracing caches first keeps the process under the
    # cliff; recompiles are cheap via the persistent cache.
    jax.clear_caches()


@pytest.fixture(scope="module")
def bundle():
    return build_bundle(mini=True)


def _run_frames(bundle, frames, bucket_for=None, trk=TRK):
    """bucket_for: optional fn(frame_idx) -> reid_bucket."""
    store = empty_store(trk)
    outs = []
    for i, f in enumerate(frames):
        kw = {}
        if bucket_for is not None:
            kw["reid_bucket"] = bucket_for(i)
        store, res = fs.frame_step(bundle, store, jnp.asarray(f), trk,
                                   NMSC, PIPE, None, **kw)
        outs.append(jax.device_get(res))
    return outs


def _tracks_tuple(res):
    t = res.tracks
    return [(int(t.track_id[k]), tuple(np.asarray(t.tlbr[k])),
             float(t.score[k]), int(t.det_index[k]))
            for k in range(len(t.valid)) if t.valid[k]]


def test_full_bucket_matches_dynamic(bundle):
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (4, 240, 320, 3), dtype=np.uint8)
    dyn = _run_frames(bundle, frames)
    stat = _run_frames(bundle, frames, bucket_for=lambda i: 8)
    for a, b in zip(dyn, stat):
        assert _tracks_tuple(a) == _tracks_tuple(b)
        np.testing.assert_array_equal(a.det_boxes, b.det_boxes)


def test_mid_bucket_matches_dynamic_when_sufficient(bundle):
    """Bucket 4 must match dynamic whenever <= 4 bodies are live.

    The body count comes from random-init models on random pixels, so
    instead of skipping when the scene is too busy (a parity contract
    must always run), derive a det-score cut that caps live bodies at 4
    per frame and run both paths under it."""
    import dataclasses

    rng = np.random.default_rng(8)
    frames = rng.integers(0, 255, (4, 240, 320, 3), dtype=np.uint8)
    probe = _run_frames(bundle, frames)
    cut = TRK.det_score_threshold
    for r in probe:
        valid = np.asarray(r.det_valid[0][:8])
        s = np.asarray(r.det_scores[0][:8])[valid]
        if len(s) > 4:
            # det_valid uses strict >, so the 5th-highest score keeps
            # exactly the top 4 (scores are continuous -> distinct).
            cut = max(cut, float(np.sort(s)[-5]))
    trk = dataclasses.replace(TRK, det_score_threshold=cut)
    dyn = _run_frames(bundle, frames, trk=trk)
    n_live = [int(np.asarray(r.det_valid[0][:8]).sum()) for r in dyn]
    assert 1 <= max(n_live) <= 4, n_live
    stat = _run_frames(bundle, frames, bucket_for=lambda i: 4, trk=trk)
    for a, b in zip(dyn, stat):
        assert _tracks_tuple(a) == _tracks_tuple(b)


def test_zero_bucket_on_empty_scene(bundle):
    trk = TrackerConfig(max_tracks=16, body_feature_dim=256,
                        face_feature_dim=256, det_score_threshold=0.99,
                        track_high_thresh=0.22, track_low_thresh=0.05,
                        new_track_thresh=0.24)
    rng = np.random.default_rng(9)
    frame = jnp.asarray(rng.integers(0, 255, (240, 320, 3),
                                     dtype=np.uint8))
    s0 = empty_store(trk)
    s1 = empty_store(trk)
    _, dyn = fs.frame_step(bundle, s0, frame, trk, NMSC, PIPE)
    _, stat = fs.frame_step(bundle, s1, frame, trk, NMSC, PIPE, None,
                            reid_bucket=0)
    assert not np.asarray(dyn.tracks.valid).any()
    assert _tracks_tuple(jax.device_get(dyn)) == \
        _tracks_tuple(jax.device_get(stat))


def test_host_dispatch_matches_dynamic_pipeline(bundle):
    rng = np.random.default_rng(10)
    frames = rng.integers(0, 255, (5, 240, 320, 3), dtype=np.uint8)

    on = BoTSORTPipeline(bundle, TRK, NMSC, PIPE)
    assert on.pipe_cfg.host_bucket_dispatch
    import dataclasses

    off_cfg = dataclasses.replace(PIPE, host_bucket_dispatch=False)
    off = BoTSORTPipeline(bundle, TRK, NMSC, off_cfg)

    for i, f in enumerate(frames):
        if i == 2:
            # Force the overflow path: pretend last frame was empty so
            # the dispatcher picks bucket 0 and must re-run when the
            # scene turns out busy.
            on._last_n_live = 0
        got = on.update(f)
        want = off.update(f)
        assert [g.track_id for g in got] == [w.track_id for w in want]
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g.tlbr, w.tlbr)
            assert g.score == w.score


def test_batched_dispatch_matches_dynamic(bundle):
    import dataclasses

    from botsort_tpu.pipeline.host import BatchedBoTSORTPipeline

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 255, (3, 2, 120, 160, 3), dtype=np.uint8)
    on = BatchedBoTSORTPipeline(bundle, 2, TRK, NMSC, PIPE)
    off = BatchedBoTSORTPipeline(
        bundle, 2, TRK, NMSC,
        dataclasses.replace(PIPE, host_bucket_dispatch=False))
    for t in range(frames.shape[0]):
        if t == 1:
            on._last_max_live = 0   # force the overflow re-run path
        got = on.update(frames[t])
        want = off.update(frames[t])
        for s in range(2):
            assert [g.track_id for g in got[s]] == \
                [w.track_id for w in want[s]]
            for g, w in zip(got[s], want[s]):
                np.testing.assert_array_equal(g.tlbr, w.tlbr)


def test_bucket_picker():
    p = BoTSORTPipeline(build_bundle(mini=True), TRK, NMSC, PIPE)
    assert p._buckets == [0, 4, 8]
    assert p._pick_bucket(0) == 0
    assert p._pick_bucket(1) == 4
    assert p._pick_bucket(4) == 4
    assert p._pick_bucket(5) == 8
    assert p._pick_bucket(99) == 8
