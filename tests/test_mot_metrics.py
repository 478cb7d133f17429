"""MOTA/IDF1 metrics on hand-constructed traces."""

import numpy as np

from botsort_tpu.eval import mot_metrics


def trace(entries):
    out = {}
    for frame, tid, x, y, w, h in entries:
        out.setdefault(frame, []).append(
            (tid, np.array([x, y, w, h], float)))
    return out


def test_perfect_tracking():
    gt = trace([(f, 1, 10 + f, 10, 50, 100) for f in range(1, 11)]
               + [(f, 2, 200, 10 + f, 50, 100) for f in range(1, 11)])
    hyp = trace([(f, 7, 10 + f, 10, 50, 100) for f in range(1, 11)]
                + [(f, 9, 200, 10 + f, 50, 100) for f in range(1, 11)])
    m = mot_metrics.clear_mot(gt, hyp)
    assert m["MOTA"] == 1.0 and m["IDSW"] == 0
    i = mot_metrics.idf1(gt, hyp)
    assert i["IDF1"] == 1.0


def test_id_switch_detected():
    gt = trace([(f, 1, 10, 10, 50, 100) for f in range(1, 11)])
    # Hypothesis switches id at frame 6.
    hyp = trace([(f, 7, 10, 10, 50, 100) for f in range(1, 6)]
                + [(f, 8, 10, 10, 50, 100) for f in range(6, 11)])
    m = mot_metrics.clear_mot(gt, hyp)
    assert m["IDSW"] == 1
    assert abs(m["MOTA"] - 0.9) < 1e-9
    i = mot_metrics.idf1(gt, hyp)
    assert abs(i["IDF1"] - 0.5) < 1e-9  # best identity covers 5/10


def test_fp_fn_counted():
    gt = trace([(f, 1, 10, 10, 50, 100) for f in range(1, 6)])
    hyp = trace([(f, 7, 10, 10, 50, 100) for f in range(1, 4)]   # 2 FN
                + [(f, 8, 500, 500, 50, 100) for f in range(1, 3)])  # 2 FP
    m = mot_metrics.clear_mot(gt, hyp)
    assert m["FN"] == 2 and m["FP"] == 2
    assert abs(m["MOTA"] - (1 - 4 / 5)) < 1e-9


def test_prefers_carried_match_over_swap():
    # Two overlapping gt objects; hypothesis boxes equidistant — the
    # carried assignment from frame 1 must persist (no spurious IDSW).
    gt = trace([(f, 1, 10, 10, 50, 100) for f in range(1, 6)]
               + [(f, 2, 30, 10, 50, 100) for f in range(1, 6)])
    hyp = trace([(f, 7, 10, 10, 50, 100) for f in range(1, 6)]
                + [(f, 9, 30, 10, 50, 100) for f in range(1, 6)])
    m = mot_metrics.clear_mot(gt, hyp)
    assert m["IDSW"] == 0
