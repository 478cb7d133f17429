"""Tracker-state checkpoint/resume: snapshot mid-scenario, restore, and
verify the continuation is identical to an uninterrupted run."""

import numpy as np
import jax.numpy as jnp

from botsort_tpu.config import TrackerConfig
from botsort_tpu.runtime.checkpoint import load_store, save_store
from botsort_tpu.track.cascade import tracker_update
from botsort_tpu.track.state import empty_store

CFG = TrackerConfig(max_tracks=8, max_dets=4, body_feature_dim=16,
                    face_feature_dim=8, track_buffer=10)


def frame_inputs(rng, t):
    tlbr = np.zeros((4, 4), np.float32)
    tlbr[0] = [10 + 2 * t, 10, 60 + 2 * t, 110]
    tlbr[1] = [200, 50 + 3 * t, 260, 170 + 3 * t]
    score = np.array([0.95, 0.92, 0, 0], np.float32)
    valid = np.array([True, True, False, False])
    bf = rng.normal(size=(4, 16)).astype(np.float32)
    bf /= np.linalg.norm(bf, axis=1, keepdims=True)
    ff = rng.normal(size=(4, 8)).astype(np.float32)
    ff /= np.linalg.norm(ff, axis=1, keepdims=True)
    return (jnp.asarray(tlbr), jnp.asarray(score), jnp.asarray(valid),
            jnp.asarray(bf), jnp.asarray(ff))


def test_checkpoint_roundtrip(tmp_path):
    rng1 = np.random.default_rng(0)
    store = empty_store(CFG)
    for t in range(5):
        store, _ = tracker_update(store, *frame_inputs(rng1, t), CFG)

    path = str(tmp_path / "store_ckpt")
    save_store(path, store)
    restored = load_store(path, CFG)
    assert restored is not None

    # Continue both for 5 more frames with identical inputs.
    rng_a = np.random.default_rng(1)
    rng_b = np.random.default_rng(1)
    s_a, s_b = store, restored
    for t in range(5, 10):
        s_a, out_a = tracker_update(s_a, *frame_inputs(rng_a, t), CFG)
        s_b, out_b = tracker_update(s_b, *frame_inputs(rng_b, t), CFG)
        np.testing.assert_array_equal(np.asarray(out_a.valid),
                                      np.asarray(out_b.valid))
        np.testing.assert_array_equal(np.asarray(out_a.track_id),
                                      np.asarray(out_b.track_id))
        np.testing.assert_allclose(np.asarray(out_a.tlbr),
                                   np.asarray(out_b.tlbr), rtol=1e-6)


def test_load_missing_returns_none(tmp_path):
    assert load_store(str(tmp_path / "nope"), CFG) is None
