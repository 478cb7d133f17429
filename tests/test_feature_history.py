"""Optional per-track feature-history ring buffer (cfg.feature_history>0,
the reference's 300-deep deques, demo:481,488)."""

import numpy as np
import jax.numpy as jnp

from botsort_tpu.config import TrackerConfig
from botsort_tpu.track.cascade import tracker_update
from botsort_tpu.track.state import empty_store

CFG = TrackerConfig(max_tracks=4, max_dets=2, body_feature_dim=8,
                    face_feature_dim=4, feature_history=3)


def frame_inputs(t):
    tlbr = np.zeros((2, 4), np.float32)
    tlbr[0] = [10 + t, 10, 60 + t, 110]
    score = np.array([0.95, 0], np.float32)
    valid = np.array([True, False])
    bf = np.zeros((2, 8), np.float32)
    bf[0, t % 8] = 1.0  # distinct one-hot feature per frame
    ff = np.zeros((2, 4), np.float32)
    ff[0, t % 4] = 1.0
    return (jnp.asarray(tlbr), jnp.asarray(score), jnp.asarray(valid),
            jnp.asarray(bf), jnp.asarray(ff))


def test_ring_buffer_records_and_wraps():
    store = empty_store(CFG)
    assert store.body_hist is not None and store.body_hist.shape == (4, 3, 8)
    for t in range(5):
        store, out = tracker_update(store, *frame_inputs(t), CFG)
    # Track in slot 0; wrote 5 features into a depth-3 ring:
    # positions hold frames [3, 4, 2] (t mod 3).
    hist = np.asarray(store.body_hist)[0]
    assert int(np.asarray(store.hist_pos)[0]) == 5
    assert hist[0, 3 % 8] == 1.0   # frame t=3 at ring slot 0
    assert hist[1, 4 % 8] == 1.0   # frame t=4 at ring slot 1
    assert hist[2, 2 % 8] == 1.0   # frame t=2 at ring slot 2
    # face ring too
    fhist = np.asarray(store.face_hist)[0]
    assert fhist[1, 4 % 4] == 1.0
