"""Parity vs the reference's OWN executable BoTSORT (demo:1291-1639).

These tests drive the reference's real code (loaded via
tests/reference_exec.py with a native-LAPJV ``lap`` shim and stub model
objects), the hand-written numpy oracle, and the fixed-shape TPU cascade
on identical synthetic inputs, frame by frame. The oracle/TPU pair is
already locked together by tests/test_cascade*.py; these tests make the
reference's actual code — not the oracle — the parity authority.

Scenario constraint discovered by executing the reference: any frame
with >= 2 body detections, NONE above track_high_thresh, crashes
``BoTSORT.update`` with a numpy broadcast ValueError (demo:1552 —
``ious_dists`` is [M, 0] when current_stracks is empty while
``emb_dists`` stays [M, N_all]); see test_reference_crashes_on_all_low_frames.
Scenario generators therefore guarantee >= 1 high det on multi-det
frames — the regime where the reference is well-defined.
"""

import numpy as np
import pytest

from tests import reference_exec
from tests.oracle.botsort_np import NpBoTSORT
from tests.test_cascade import (
    CFG, Scene, compare, make_oracle, make_tpu, run_oracle_frame,
    run_tpu_frame, unit)

pytestmark = pytest.mark.skipif(
    not reference_exec.reference_available(),
    reason="reference demo not present")


@pytest.fixture(scope="module", autouse=True)
def _clear_jit_cache():
    # Compile-heavy module late in the alphabet: shed live executables
    # to dodge the known XLA:CPU JIT segfault (see CLAUDE.md).
    import jax
    jax.clear_caches()
    yield
    jax.clear_caches()


def make_reference():
    return reference_exec.ReferenceTracker(
        body_dim=CFG.body_feature_dim, face_dim=CFG.face_feature_dim,
        max_time_lost=CFG.max_time_lost)


def int_dets(dets):
    """Floor boxes to ints — the reference slices crops with them; both
    sides then consume the identical integer-valued boxes."""
    return [(np.floor(np.asarray(b, np.float64)), s, bf, ff)
            for (b, s, bf, ff) in dets]


def run_ref_frame(ref, dets):
    tlbr = [d[0] for d in dets]
    score = [d[1] for d in dets]
    bf = [np.asarray(d[2], np.float64) for d in dets]
    ff = [np.asarray(d[3], np.float64) for d in dets]
    return ref.update(tlbr, score, bf, ff)


def compare_exact(frame_no, got, want, atol=1e-3):
    """reference vs oracle: same ids, same matched dets, boxes to fp
    noise (the oracle runs float64 end-to-end; the reference's STrack
    holds float32 _tlwh on frame one, demo:465)."""
    assert set(got) == set(want), (
        f"frame {frame_no}: reference ids {sorted(got)} vs {sorted(want)}")
    for tid in want:
        np.testing.assert_allclose(
            got[tid][0], want[tid][0], atol=atol,
            err_msg=f"frame {frame_no} track {tid} box")
        assert got[tid][1] == want[tid][1], (
            f"frame {frame_no} track {tid}: det {got[tid][1]} vs "
            f"{want[tid][1]}")


def run_scenario_vs_reference(seed, frames, detfn, n_obj=3,
                              with_tpu=False):
    scene = Scene(seed, n_obj)
    ref = make_reference()
    oracle = make_oracle()
    store = make_tpu() if with_tpu else None
    for fr in range(1, frames + 1):
        dets = int_dets(detfn(scene, fr))
        got = run_ref_frame(ref, dets)
        want = run_oracle_frame(oracle, dets)
        compare_exact(fr, got, want)
        if with_tpu:
            store, tpu_out = run_tpu_frame(store, dets)
            compare(fr, tpu_out, got)  # TPU cascade vs the reference
        scene.step()
    return ref, oracle


def test_stable_ids_reference_parity():
    ref, oracle = run_scenario_vs_reference(
        10, 30, lambda sc, fr: [sc.det(i) for i in range(3)],
        with_tpu=True)
    assert oracle.count == 3
    # Same id allocation in the reference's global counter.
    assert ref.mod.BaseTrack._count >= 3


def test_low_score_pass2_reference_parity():
    def detfn(sc, fr):
        s0 = 0.38 if 10 <= fr <= 20 else 0.95
        return [sc.det(0, score=s0)] + [sc.det(i) for i in (1, 2)]

    run_scenario_vs_reference(11, 30, detfn, with_tpu=True)


def test_occlusion_reactivation_reference_parity():
    def detfn(sc, fr):
        dets = [sc.det(i) for i in range(3)]
        if 12 <= fr <= 17:
            dets.pop(1)
        return dets

    run_scenario_vs_reference(12, 30, detfn, with_tpu=True)


def test_new_track_gating_reference_parity():
    def detfn(sc, fr):
        dets = [sc.det(0), sc.det(1)]
        if fr >= 5:
            dets.append(sc.det(2, score=0.6))
        return dets

    _, oracle = run_scenario_vs_reference(13, 20, detfn)
    assert oracle.count == 2


def test_expiry_reference_parity():
    def detfn(sc, fr):
        dets = [sc.det(0)]
        if fr < 5 or fr > 5 + CFG.max_time_lost + 3:
            dets.append(sc.det(1))
        return dets

    _, oracle = run_scenario_vs_reference(14, 40, detfn, n_obj=2)
    assert oracle.count == 3


def test_no_face_mask_reference_parity():
    # Faceless dets share one embedding; its degenerate similarity hits
    # the reference's 0.9999999 anomaly mask (demo:1481-1483), which the
    # stub face encoder reproduces (reference_exec._StubFaceEncoder).
    def detfn(sc, fr):
        return [sc.det(0, has_face=False), sc.det(1, has_face=False)]

    run_scenario_vs_reference(15, 25, detfn, n_obj=2, with_tpu=True)


def test_fuzz_reference_parity():
    rng = np.random.default_rng(77)

    def detfn(sc, fr):
        dets = []
        for i in range(4):
            r = rng.uniform()
            if r < 0.15:
                continue
            score = 0.95 if r > 0.35 else float(rng.uniform(0.2, 0.39))
            dets.append((i, score, bool(rng.uniform() > 0.3)))
        # The reference is undefined (crashes) on multi-det all-low
        # frames; force one det high there (see module docstring).
        if len(dets) >= 2 and all(s <= 0.40 for _, s, _ in dets):
            i, _, hf = dets[0]
            dets[0] = (i, 0.95, hf)
        return [sc.det(i, score=s, has_face=hf) for i, s, hf in dets]

    run_scenario_vs_reference(16, 50, detfn, n_obj=4)


def test_long_occlusion_reactivation_reference_parity():
    """Lost -> re_activate at the expiry BOUNDARY (VERDICT r4 #8): an
    object missing for max_time_lost-1 frames must come back with its
    old id (the reference expires only when frame_id - end_frame >
    max_time_lost, demo:1623-1627); one missing two frames longer must
    get a NEW id. Both sides verified frame-by-frame either way."""
    gap = CFG.max_time_lost - 1
    lost_at = 6

    def detfn(sc, fr):
        dets = [sc.det(0)]
        if not (lost_at <= fr < lost_at + gap):
            dets.append(sc.det(1))
        return dets

    _, oracle = run_scenario_vs_reference(
        21, lost_at + gap + 8, detfn, n_obj=2, with_tpu=True)
    assert oracle.count == 2  # re-activated, no new id

    gap2 = CFG.max_time_lost + 2

    def detfn2(sc, fr):
        dets = [sc.det(0)]
        if not (lost_at <= fr < lost_at + gap2):
            dets.append(sc.det(1))
        return dets

    _, oracle = run_scenario_vs_reference(
        22, lost_at + gap2 + 8, detfn2, n_obj=2, with_tpu=True)
    assert oracle.count == 3  # expired -> fresh id


def test_slot_pressure_vs_reference_unbounded():
    """Ours has fixed track slots (SoA store); the reference's lists are
    unbounded. At max_tracks saturation the kept subset must still match
    the reference's tracks det-for-det, the excess must surface via
    dropped_new (not silent id burn), and the id mapping must stay
    stable across frames (VERDICT r4 #8)."""
    import jax.numpy as jnp

    from botsort_tpu.config import TrackerConfig
    from botsort_tpu.track.cascade import tracker_update
    from botsort_tpu.track.state import empty_store

    small = TrackerConfig(max_tracks=4, max_dets=8, body_feature_dim=32,
                          face_feature_dim=16, track_buffer=20)
    n_obj = 6
    # Scene's feature dims come from CFG (32/16) — same as `small`.
    scene = Scene(31, n_obj)
    ref = make_reference()
    store = empty_store(small)
    d = small.max_dets

    def run_small_tpu(store, dets):
        tlbr = np.zeros((d, 4), np.float32)
        score = np.zeros((d,), np.float32)
        valid = np.zeros((d,), bool)
        bf = np.zeros((d, small.body_feature_dim), np.float32)
        ff = np.zeros((d, small.face_feature_dim), np.float32)
        for i, (box, s, b, f) in enumerate(dets):
            tlbr[i], score[i], valid[i], bf[i], ff[i] = box, s, True, b, f
        store, out = tracker_update(
            store, jnp.asarray(tlbr), jnp.asarray(score),
            jnp.asarray(valid), jnp.asarray(bf), jnp.asarray(ff), small)
        res = {}
        for k in range(len(out.valid)):
            if np.asarray(out.valid)[k]:
                res[int(np.asarray(out.track_id)[k])] = (
                    np.asarray(out.tlbr)[k],
                    int(np.asarray(out.det_index)[k]))
        return store, res, int(np.asarray(out.dropped_new))

    id_map = {}  # our track_id -> reference track_id
    for fr in range(1, 13):
        dets = int_dets([scene.det(i) for i in range(n_obj)])
        ref_out = run_ref_frame(ref, dets)
        store, got, dropped = run_small_tpu(store, dets)
        # The reference tracks all 6; we hold max_tracks=4 and report
        # the 2 overflow candidates dropped — EVERY frame (the two
        # unmatched high-score dets re-candidate each frame).
        assert len(ref_out) == n_obj
        assert len(got) == small.max_tracks
        assert dropped == n_obj - small.max_tracks
        ref_by_det = {det: (tid, box)
                      for tid, (box, det) in ref_out.items()}
        for our_tid, (box, det) in got.items():
            ref_tid, ref_box = ref_by_det[det]
            np.testing.assert_allclose(box, ref_box, atol=0.2)
            assert id_map.setdefault(our_tid, ref_tid) == ref_tid, (
                f"frame {fr}: our track {our_tid} drifted between "
                "reference identities")
        scene.step()
    # Our ids are dense (no ids burned on dropped candidates).
    assert set(id_map) == {1, 2, 3, 4}


def test_multi_gmc_reference_parity():
    """ops/kalman.apply_affine vs the reference's EXECUTED multi_gmc
    (demo:538-554 — dead code upstream, but the spec for camera-motion
    compensation; VERDICT r4 #8). Run real tracker state through both:
    similarity transforms must agree exactly (mean AND covariance);
    rotations must agree exactly on the MEAN while the scalar-form
    covariance stays within the documented O(sin^2 theta) envelope
    (ops/kalman.py::apply_affine docstring)."""
    import jax.numpy as jnp

    from botsort_tpu.ops.kalman import apply_affine, cov_from_dense, \
        cov_to_dense

    ref, _ = run_scenario_vs_reference(
        23, 12, lambda sc, fr: [sc.det(i) for i in range(3)])
    stracks = (list(ref.tracker.tracked_stracks)
               + list(ref.tracker.lost_stracks))
    assert len(stracks) >= 3
    means = np.asarray([st.mean.copy() for st in stracks])
    covs = np.asarray([st.covariance.copy() for st in stracks])
    # Scalar-form conversion is valid iff the reference's covariance is
    # block-diagonal (proven invariant, tests/test_kalman.py) — check.
    dense_back = np.asarray(cov_to_dense(cov_from_dense(covs)))
    np.testing.assert_allclose(dense_back, covs, atol=1e-9)

    for name, h in [
        ("similarity", np.array([[1.03, 0.0, 5.0],
                                 [0.0, 1.03, -3.0]])),
        ("rotation1deg", np.hstack([
            1.02 * np.array([[np.cos(0.0175), -np.sin(0.0175)],
                             [np.sin(0.0175), np.cos(0.0175)]]),
            [[2.0], [1.0]]])),
    ]:
        got_mean, got_cov = apply_affine(
            jnp.asarray(means, jnp.float32),
            jnp.asarray(cov_from_dense(covs), jnp.float32),
            jnp.asarray(h, jnp.float32))
        # Execute the reference's own transform on copies.
        copies = []
        for st, m, c in zip(stracks, means, covs):
            cp = type("S", (), {})()
            cp.mean, cp.covariance = m.copy(), c.copy()
            copies.append(cp)
        ref.mod.STrack.multi_gmc(copies, h)
        want_mean = np.asarray([cp.mean for cp in copies])
        want_cov = np.asarray([cp.covariance for cp in copies])
        np.testing.assert_allclose(
            np.asarray(got_mean), want_mean, rtol=1e-5, atol=5e-3,
            err_msg=f"{name}: mean transform diverges from multi_gmc")
        got_dense = np.asarray(cov_to_dense(got_cov))
        if name == "similarity":
            np.testing.assert_allclose(
                got_dense, want_cov, rtol=1e-4, atol=1e-5,
                err_msg="similarity covariance must be exact")
        else:
            idx = np.arange(8)
            np.testing.assert_allclose(
                got_dense[:, idx, idx], want_cov[:, idx, idx],
                rtol=2e-2, atol=1e-4,
                err_msg="rotation covariance diag outside the "
                        "documented O(sin^2) envelope")


def _tie_free_np_greedy(bases, targets, rounds=1):
    """np_greedy (tests/test_crop_hierarchy.py) that also reports whether
    any claim had an IoU tie among unused targets. Tied scenes are
    regenerated: the reference tie-breaks by INTEGER center distance
    (demo:1784-1788 over demo:102's int centers) while our op uses true
    float centers — a documented deviation (ops/hierarchy.py:12-16), so
    tie outcomes are not contractual."""
    from tests.oracle import boxes_np
    used = [False] * len(targets)
    tied = False
    for base in bases:
        for _ in range(rounds):
            best_iou = 0.0
            n_best = 0
            for ti, tgt in enumerate(targets):
                if used[ti]:
                    continue
                i = boxes_np.iou_single(base, tgt)
                if i > best_iou:
                    best_iou, n_best, best = i, 1, ti
                elif i > 0.0 and i == best_iou:
                    n_best += 1
            if n_best > 1:
                tied = True
            if n_best >= 1:
                used[best] = True
    return tied


def _gen_hierarchy_scene(rng):
    """Random integer multi-class scene in a 256x256 frame: bodies with
    plausible sub-boxes (heads near the top, faces inside heads, hands
    near the sides) plus decoys, so attachments are contested but
    IoU-positive."""
    def jitter(lo, hi):
        return int(rng.integers(lo, hi + 1))

    bodies, heads, faces, hands = [], [], [], []
    n_b = int(rng.integers(2, 6))
    for _ in range(n_b):
        w = jitter(30, 60)
        h = jitter(60, 110)
        x1 = jitter(0, 255 - w)
        y1 = jitter(0, 255 - h)
        bodies.append((x1, y1, x1 + w, y1 + h))
        if rng.uniform() < 0.8:                      # its head
            hw = max(8, w // 2 + jitter(-4, 4))
            hh = max(8, h // 5 + jitter(-4, 4))
            hx = min(max(0, x1 + w // 4 + jitter(-8, 8)), 255 - hw)
            hy = min(max(0, y1 - hh // 2 + jitter(-4, 8)), 255 - hh)
            heads.append((hx, hy, hx + hw, hy + hh))
            if rng.uniform() < 0.7:                  # its face
                fw = max(4, hw - jitter(2, 6))
                fh = max(4, hh - jitter(2, 6))
                fx = min(max(0, hx + jitter(0, 4)), 255 - fw)
                fy = min(max(0, hy + jitter(0, 4)), 255 - fh)
                faces.append((fx, fy, fx + fw, fy + fh))
        for side in (0, 1):                          # hands
            if rng.uniform() < 0.5:
                nw = jitter(8, 16)
                nx = min(max(0, (x1 - nw // 2) if side == 0
                             else (x1 + w - nw // 2)), 255 - nw)
                ny = min(max(0, y1 + h // 2 + jitter(-6, 6)), 255 - nw)
                hands.append((nx, ny, nx + nw, ny + nw))
    for lst, lo, hi in ((heads, 8, 24), (faces, 4, 12), (hands, 8, 16)):
        if rng.uniform() < 0.4:                      # a decoy far away
            s = jitter(lo, hi)
            x1 = jitter(0, 255 - s)
            y1 = jitter(0, 255 - s)
            lst.append((x1, y1, x1 + s, y1 + s))

    def dedupe(lst):
        seen, out = set(), []
        for b in lst:
            if b not in seen:
                seen.add(b)
                out.append(b)
        return out

    return (dedupe(bodies), dedupe(heads), dedupe(hands), dedupe(faces))


def _ours_attachments(bodies, heads, hands, faces, slots=8):
    """Our fixed-shape hierarchy (the exact frame_step problem set,
    pipeline/frame_step.py:342-352) on the same scene."""
    import jax.numpy as jnp

    from botsort_tpu.ops import hierarchy

    def pad(lst):
        arr = np.zeros((slots, 4), np.float32)
        valid = np.zeros((slots,), bool)
        for i, b in enumerate(lst):
            arr[i] = b
            valid[i] = True
        return jnp.asarray(arr), jnp.asarray(valid)

    b, bv = pad(bodies)
    h, hv = pad(heads)
    n, nv = pad(hands)
    f, fv = pad(faces)
    results = hierarchy.greedy_assign_batch([
        (h, hv, f, fv, 1), (b, bv, h, hv, 1), (b, bv, n, nv, 2)])
    (face_for_head,) = results[0]
    (head_for_body,) = results[1]
    hand1, hand2 = results[2]
    face_for_head = np.asarray(face_for_head)
    out = []
    for bi in range(len(bodies)):
        hd = int(np.asarray(head_for_body)[bi])
        fc = int(face_for_head[hd]) if hd >= 0 else -1
        out.append((hd, fc, int(np.asarray(hand1)[bi]),
                    int(np.asarray(hand2)[bi])))
    return out


def test_hierarchy_attachment_reference_parity():
    """The reference's OWN executable attachment (BoTSORT.update's
    face->head / head->body / hands->body greedy walks, demo:1372-1411 +
    find_most_relevant_object demo:1763-1791) vs ops/hierarchy.py on
    fuzzed multi-class scenes. IoU-tied scenes are skipped (documented
    tie-break deviation, ops/hierarchy.py:12-16) — they must stay rare."""
    rng = np.random.default_rng(20260819)
    checked = attempts = 0
    while checked < 12:
        attempts += 1
        assert attempts < 60, "IoU ties should be rare in this generator"
        bodies, heads, hands, faces = _gen_hierarchy_scene(rng)
        barr = [np.asarray(x, float) for x in bodies]
        harr = [np.asarray(x, float) for x in heads]
        narr = [np.asarray(x, float) for x in hands]
        farr = [np.asarray(x, float) for x in faces]
        if (_tie_free_np_greedy(harr, farr)
                or _tie_free_np_greedy(barr, harr)
                or _tie_free_np_greedy(barr, narr, rounds=2)):
            continue
        ref = reference_exec.ReferenceTracker(
            body_dim=CFG.body_feature_dim, face_dim=CFG.face_feature_dim,
            image_hw=(256, 256))
        want = ref.update_multiclass(bodies, heads, hands, faces)
        got = _ours_attachments(bodies, heads, hands, faces)
        assert got == want, (
            f"scene bodies={bodies} heads={heads} hands={hands} "
            f"faces={faces}: ours {got} vs reference {want}")
        checked += 1


def test_hierarchy_attachment_reference_directed():
    """Nested face-in-head-on-body plus an unattachable decoy body."""
    bodies = [(40, 60, 90, 170), (150, 60, 200, 170), (10, 200, 40, 250)]
    heads = [(50, 50, 80, 80), (160, 50, 190, 80)]
    faces = [(55, 55, 75, 78), (165, 55, 185, 78)]
    hands = [(38, 110, 52, 124), (78, 112, 92, 126), (148, 110, 162, 124)]
    ref = reference_exec.ReferenceTracker(
        body_dim=CFG.body_feature_dim, face_dim=CFG.face_feature_dim,
        image_hw=(256, 256))
    want = ref.update_multiclass(bodies, heads, hands, faces)
    got = _ours_attachments(bodies, heads, hands, faces)
    assert got == want
    assert want[0][0] == 0 and want[0][1] == 0      # body0 <- head0/face0
    assert want[1][0] == 1 and want[1][1] == 1
    assert want[2] == (-1, -1, -1, -1)              # decoy: nothing near


def test_reference_crashes_on_all_low_frames():
    """Executable documentation of a latent reference bug (and our
    deliberate deviation): a frame whose detections all fall in the
    low-score band (possible live: YOLOX's min score 0.35 < track_high
    0.40) crashes BoTSORT.update with a broadcast ValueError at
    demo:1552, because ious_dists is [M, 0] (no high dets -> no
    current_stracks) while emb_dists keeps one column per raw body box.
    Our cascade and the oracle handle the same frame gracefully."""
    rng = np.random.default_rng(5)
    boxes = [np.array([100., 100., 160., 200.]),
             np.array([300., 300., 360., 400.])]
    feats = [(unit(rng.normal(size=CFG.body_feature_dim)),
              unit(rng.normal(size=CFG.face_feature_dim)))
             for _ in range(4)]
    high = [(boxes[i], 0.95, feats[i][0], feats[i][1]) for i in range(2)]
    low = [(boxes[i] + 2.0, 0.38, feats[i + 2][0], feats[i + 2][1])
           for i in range(2)]

    ref = make_reference()
    run_ref_frame(ref, high)
    with pytest.raises(ValueError, match="broadcast"):
        run_ref_frame(ref, low)

    # Ours (and the oracle) keep tracking through that exact frame.
    oracle = make_oracle()
    store = make_tpu()
    for dets in (high, low):
        got_oracle = run_oracle_frame(oracle, dets)
        store, got_tpu = run_tpu_frame(store, dets)
        assert set(got_tpu) == set(got_oracle)
    # Both low dets matched to the existing tracks via pass 2.
    assert sorted(got_oracle) == [1, 2]
