"""frame_step_batched vs independent single-stream frame_step runs."""

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
from botsort_tpu.pipeline.frame_step import frame_step, frame_step_batched
from botsort_tpu.runtime.assets import build_bundle
from botsort_tpu.track.state import empty_store

TRK = TrackerConfig(max_tracks=16, body_feature_dim=256,
                    face_feature_dim=256)
NMSC = NMSConfig(max_boxes_per_class=8, score_threshold=0.01)
PIPE = PipelineConfig(detector_input_hw=(96, 128),
                      body_reid_input_hw=(64, 32),
                      face_reid_input_hw=(32, 32),
                      max_reid_batch=4)

B = 2


def test_batched_matches_single_stream():
    bundle = build_bundle(mini=True)
    rng = np.random.default_rng(0)
    all_frames = [
        rng.integers(0, 255, (B, 120, 160, 3), dtype=np.uint8)
        for _ in range(3)
    ]

    one = empty_store(TRK)
    stores = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                          one)
    batched_out = []
    for f in all_frames:
        stores, res = frame_step_batched(bundle, stores, jnp.asarray(f),
                                         TRK, NMSC, PIPE)
        batched_out.append(jax.device_get(res.tracks))

    for s in range(B):
        store = empty_store(TRK)
        for t, f in enumerate(all_frames):
            store, res = frame_step(bundle, store, jnp.asarray(f[s]),
                                    TRK, NMSC, PIPE)
            ref = jax.device_get(res.tracks)
            np.testing.assert_array_equal(batched_out[t].valid[s],
                                          ref.valid)
            np.testing.assert_array_equal(
                batched_out[t].track_id[s][ref.valid],
                ref.track_id[ref.valid])
            np.testing.assert_allclose(
                batched_out[t].tlbr[s][ref.valid],
                ref.tlbr[ref.valid], rtol=1e-5, atol=1e-3)
            np.testing.assert_array_equal(
                batched_out[t].det_index[s][ref.valid],
                ref.det_index[ref.valid])


def test_batched_with_per_stream_gmc():
    """Per-stream GMC matrices flow through the batched cascade."""
    bundle = build_bundle(mini=True)
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (B, 120, 160, 3), dtype=np.uint8)
    one = empty_store(TRK)
    stores = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                          one)
    gmc = jnp.stack([
        jnp.asarray([[1.0, 0.0, 5.0], [0.0, 1.0, 0.0]], jnp.float32),
        jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, -3.0]], jnp.float32),
    ])
    stores, res = frame_step_batched(bundle, stores, jnp.asarray(frames),
                                     TRK, NMSC, PIPE, gmc)
    # GMC applies to the (empty) pool on frame 1: must run cleanly and
    # match the non-GMC result for an empty store (nothing to transform).
    one2 = empty_store(TRK)
    stores2 = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                           one2)
    _, res2 = frame_step_batched(bundle, stores2, jnp.asarray(frames),
                                 TRK, NMSC, PIPE)
    np.testing.assert_array_equal(np.asarray(res.tracks.valid),
                                  np.asarray(res2.tracks.valid))


def test_temporal_batched_matches_sequential():
    """frame_step_batched_temporal([B, T]) must equal T sequential
    frame_step_batched calls bitwise (per-frame perception is
    batch-size invariant; the cascades chain identically)."""
    from botsort_tpu.pipeline.frame_step import frame_step_batched_temporal

    bundle = build_bundle(mini=True)
    rng = np.random.default_rng(3)
    T = 2
    frames = rng.integers(0, 255, (B, T, 120, 160, 3), dtype=np.uint8)

    one = empty_store(TRK)
    stores_seq = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), one)
    seq_tracks = []
    for t in range(T):
        stores_seq, res = frame_step_batched(
            bundle, stores_seq, jnp.asarray(frames[:, t]), TRK, NMSC,
            PIPE)
        seq_tracks.append(jax.device_get(res.tracks))

    stores_tmp = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), empty_store(TRK))
    stores_tmp, res_t = frame_step_batched_temporal(
        bundle, stores_tmp, jnp.asarray(frames), TRK, NMSC, PIPE)
    got = jax.device_get(res_t.tracks)

    for t in range(T):
        np.testing.assert_array_equal(got.valid[:, t],
                                      seq_tracks[t].valid)
        np.testing.assert_array_equal(got.track_id[:, t],
                                      seq_tracks[t].track_id)
        np.testing.assert_array_equal(got.tlbr[:, t],
                                      seq_tracks[t].tlbr)
    for a, b_ in zip(jax.tree.leaves(jax.device_get(stores_seq)),
                     jax.tree.leaves(jax.device_get(stores_tmp))):
        np.testing.assert_array_equal(a, b_)


def test_update_async_matches_update():
    """BatchedBoTSORTPipeline.update_async + result() must equal the
    synchronous update() exactly (same bucket dispatch, same overflow
    handling, same assembled tracks)."""
    from botsort_tpu.pipeline.host import BatchedBoTSORTPipeline

    bundle = build_bundle(mini=True)
    rng = np.random.default_rng(7)
    frames_seq = [
        rng.integers(0, 255, (B, 120, 160, 3), dtype=np.uint8)
        for _ in range(3)
    ]
    trk = TrackerConfig(max_tracks=16, body_feature_dim=256,
                        face_feature_dim=256, det_score_threshold=0.01,
                        track_high_thresh=0.05, track_low_thresh=0.01,
                        new_track_thresh=0.05)

    sync_p = BatchedBoTSORTPipeline(bundle, B, trk, NMSC, PIPE)
    async_p = BatchedBoTSORTPipeline(bundle, B, trk, NMSC, PIPE)
    for f in frames_seq:
        want = sync_p.update(f)
        handle = async_p.update_async(f)
        got = handle.result()
        assert handle.result() is got  # idempotent resolve
        assert len(want) == len(got) == B
        for s in range(B):
            assert len(want[s]) == len(got[s])
            for a, b_ in zip(want[s], got[s]):
                assert a.track_id == b_.track_id
                np.testing.assert_array_equal(a.tlbr, b_.tlbr)
