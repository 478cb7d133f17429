"""Fixed-shape TPU cascade vs the dynamic-list numpy oracle.

Synthetic multi-object scenarios exercise every lifecycle path: high/low
score passes, unconfirmed confirmation, occlusion -> lost -> re-activation,
new-track gating, expiry, and the dedup rule. Scenarios use continuous
random positions so assignment ties (where two optimal solutions exist)
do not occur.
"""

import numpy as np
import jax.numpy as jnp

from botsort_tpu.config import TrackerConfig
from botsort_tpu.track.cascade import tracker_update
from botsort_tpu.track.state import empty_store
from tests.oracle.botsort_np import NpBoTSORT

D = 16  # det slots in tests
CFG = TrackerConfig(max_tracks=32, max_dets=D, body_feature_dim=32,
                    face_feature_dim=16, track_buffer=20)


def make_tpu():
    return empty_store(CFG)


def make_oracle():
    return NpBoTSORT(buffer=CFG.max_time_lost)


def run_tpu_frame(store, dets):
    tlbr = np.zeros((D, 4), np.float32)
    score = np.zeros((D,), np.float32)
    valid = np.zeros((D,), bool)
    bf = np.zeros((D, CFG.body_feature_dim), np.float32)
    ff = np.zeros((D, CFG.face_feature_dim), np.float32)
    for i, (box, s, b, f) in enumerate(dets):
        tlbr[i] = box
        score[i] = s
        valid[i] = True
        bf[i] = b
        ff[i] = f
    store, out = tracker_update(
        store, jnp.asarray(tlbr), jnp.asarray(score), jnp.asarray(valid),
        jnp.asarray(bf), jnp.asarray(ff), CFG)
    res = {}
    v = np.asarray(out.valid)
    tl = np.asarray(out.tlbr)
    tid = np.asarray(out.track_id)
    di = np.asarray(out.det_index)
    for k in range(len(v)):
        if v[k]:
            res[int(tid[k])] = (tl[k], int(di[k]))
    return store, res


def run_oracle_frame(trk, dets):
    tlbr = np.array([d[0] for d in dets], np.float64).reshape(-1, 4)
    score = np.array([d[1] for d in dets], np.float64)
    bf = [np.asarray(d[2], np.float64) for d in dets]
    ff = [np.asarray(d[3], np.float64) for d in dets]
    out = trk.update(tlbr, score, bf, ff)
    return {tid: (box, det) for tid, box, _, det in out}


def compare(frame_no, got, want):
    assert set(got) == set(want), (
        f"frame {frame_no}: ids {sorted(got)} vs oracle {sorted(want)}")
    for tid in want:
        np.testing.assert_allclose(
            got[tid][0], want[tid][0], atol=0.2,
            err_msg=f"frame {frame_no} track {tid} box")
        assert got[tid][1] == want[tid][1], (
            f"frame {frame_no} track {tid}: det {got[tid][1]} "
            f"vs {want[tid][1]}")


def unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


class Scene:
    """Objects with linear motion and stable appearance prototypes."""

    def __init__(self, seed, n_obj):
        rng = np.random.default_rng(seed)
        self.rng = rng
        self.pos = rng.uniform(50, 500, (n_obj, 2))
        self.vel = rng.uniform(-3, 3, (n_obj, 2))
        self.size = rng.uniform(30, 80, (n_obj, 2))
        self.bproto = [unit(rng.normal(size=CFG.body_feature_dim))
                       for _ in range(n_obj)]
        self.fproto = [unit(rng.normal(size=CFG.face_feature_dim))
                       for _ in range(n_obj)]
        # Shared "no-face" zero-image embedding (identical every time, so
        # its self-similarity is exactly 1 -> exercises the mask).
        self.noface = unit(np.ones(CFG.face_feature_dim))

    def det(self, i, score=0.95, has_face=True, feat_noise=0.05):
        p = self.pos[i]
        s = self.size[i]
        box = np.array([p[0], p[1], p[0] + s[0], p[1] + s[1]], np.float32)
        b = unit(self.bproto[i]
                 + self.rng.normal(size=CFG.body_feature_dim) * feat_noise)
        f = (unit(self.fproto[i] + self.rng.normal(
            size=CFG.face_feature_dim) * feat_noise)
            if has_face else self.noface)
        return (box, score, b, f)

    def step(self):
        self.pos += self.vel


def run_scenario(seed, frames, detfn, n_obj=3):
    scene = Scene(seed, n_obj)
    store = make_tpu()
    oracle = make_oracle()
    for fr in range(1, frames + 1):
        dets = detfn(scene, fr)
        store, got = run_tpu_frame(store, dets)
        want = run_oracle_frame(oracle, dets)
        compare(fr, got, want)
        scene.step()
    return store, oracle


def test_stable_ids_basic():
    store, oracle = run_scenario(
        0, 30, lambda sc, fr: [sc.det(i) for i in range(3)])
    assert oracle.count == 3  # exactly 3 ids ever allocated


def test_low_score_keeps_track_via_pass2():
    def detfn(sc, fr):
        # object 0 drops to low-score band for frames 10..20.
        s0 = 0.38 if 10 <= fr <= 20 else 0.95
        return [sc.det(0, score=s0)] + [sc.det(i) for i in (1, 2)]

    _, oracle = run_scenario(1, 30, detfn)
    assert oracle.count == 3


def test_occlusion_reactivates_same_id():
    def detfn(sc, fr):
        dets = [sc.det(i) for i in range(3)]
        if 12 <= fr <= 17:       # object 1 occluded
            dets.pop(1)
        return dets

    run_scenario(2, 30, detfn)


def test_new_track_gating():
    def detfn(sc, fr):
        dets = [sc.det(0), sc.det(1)]
        if fr >= 5:
            dets.append(sc.det(2, score=0.6))  # below new_track_thresh
        return dets

    _, oracle = run_scenario(3, 20, detfn)
    assert oracle.count == 2


def test_expiry_allocates_new_id():
    def detfn(sc, fr):
        dets = [sc.det(0)]
        if fr < 5 or fr > 5 + CFG.max_time_lost + 3:
            dets.append(sc.det(1))
        return dets

    _, oracle = run_scenario(4, 40, detfn, n_obj=2)
    assert oracle.count == 3  # object 1 expired and came back as a new id


def test_no_face_dets_dont_cross_match():
    # Two faceless objects share the identical no-face embedding; the
    # degenerate-similarity mask must stop face cosine from fusing them.
    def detfn(sc, fr):
        return [sc.det(0, has_face=False), sc.det(1, has_face=False)]

    run_scenario(5, 25, detfn, n_obj=2)


def test_fuzz_random_dropouts():
    rng = np.random.default_rng(99)

    def detfn(sc, fr):
        dets = []
        for i in range(4):
            r = rng.uniform()
            if r < 0.15:
                continue  # missed detection
            score = 0.95 if r > 0.3 else float(rng.uniform(0.2, 0.39))
            dets.append(sc.det(i, score=score,
                               has_face=bool(rng.uniform() > 0.3)))
        return dets

    run_scenario(6, 50, detfn, n_obj=4)
