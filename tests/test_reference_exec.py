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
