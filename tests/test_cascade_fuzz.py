"""Extended cascade fuzzing and capacity-edge behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from botsort_tpu.config import TrackerConfig
from botsort_tpu.track.cascade import tracker_update
from botsort_tpu.track.state import empty_store
from tests.test_cascade import (
    CFG,
    Scene,
    compare,
    make_oracle,
    make_tpu,
    run_oracle_frame,
    run_tpu_frame,
)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_fuzz_crowded_scenes(seed):
    """8 objects, heavy dropout, mixed scores, faces on/off, 60 frames."""
    rng = np.random.default_rng(seed)
    scene = Scene(seed, 8)
    store = make_tpu()
    oracle = make_oracle()
    for fr in range(1, 61):
        dets = []
        for i in range(8):
            r = rng.uniform()
            if r < 0.2:
                continue
            score = 0.95 if r > 0.45 else float(rng.uniform(0.2, 0.39))
            dets.append(scene.det(i, score=score,
                                  has_face=bool(rng.uniform() > 0.4)))
        store, got = run_tpu_frame(store, dets)
        want = run_oracle_frame(oracle, dets)
        compare(fr, got, want)
        scene.step()


def test_slot_exhaustion_graceful():
    """More simultaneous objects than track slots: existing tracks keep
    their identities; overflow detections are dropped (bounded-memory
    policy) without corrupting state."""
    cfg = TrackerConfig(max_tracks=4, max_dets=8, body_feature_dim=16,
                        face_feature_dim=8, track_buffer=10)
    rng = np.random.default_rng(0)

    def feats(n):
        b = rng.normal(size=(8, 16)).astype(np.float32)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        f = rng.normal(size=(8, 8)).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        return b, f

    # 6 well-separated objects but only 4 slots.
    protos_b, protos_f = feats(6)
    store = empty_store(cfg)
    ids_seen = set()
    for fr in range(6):
        tlbr = np.zeros((8, 4), np.float32)
        score = np.zeros((8,), np.float32)
        valid = np.zeros((8,), bool)
        bf = np.zeros((8, 16), np.float32)
        ff = np.zeros((8, 8), np.float32)
        for i in range(6):
            x = 100.0 * i + 2 * fr
            tlbr[i] = [x, 50, x + 40, 150]
            score[i] = 0.95
            valid[i] = True
            bf[i] = protos_b[i]
            ff[i] = protos_f[i]
        store, out = tracker_update(
            store, jnp.asarray(tlbr), jnp.asarray(score),
            jnp.asarray(valid), jnp.asarray(bf), jnp.asarray(ff), cfg)
        v = np.asarray(out.valid)
        tids = np.asarray(out.track_id)[v]
        assert len(tids) <= 4
        assert len(set(tids.tolist())) == len(tids)  # unique ids
        ids_seen.update(tids.tolist())
    # The 4 slots hold stable identities across frames (no id churn).
    assert len(ids_seen) == 4, ids_seen
