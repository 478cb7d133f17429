"""CI lock on the trace-parity recipe (docs/TRACE_PARITY.md).

Diffs the checked-in synthetic fixture pair through the real
cli/eval_mot path, asserting hand-computed CLEAR-MOT/IDF1 values. The
fixtures are in exactly the format tools/capture_reference_trace.py
(reference half) and cli/eval_trace.py (our half) emit, so the parity
pipeline is proven working before real captures exist.

Fixture scene: 3 linear tracks over 10 frames; the "tpu" side carries
one 2px box perturbation (still a match), one dropped frame (1 FN) and
one id switch at frame 6 (1 IDSW).
  MOTA = 1 - (FN + FP + IDSW)/GT = 1 - 2/30
  IDTP = 10 + 9 + 5 = 24, IDFP = 29 - 24 = 5, IDFN = 30 - 24 = 6
  IDF1 = 2*24 / (2*24 + 5 + 6) = 48/59
"""

import json
import os

import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_fixture_pair_diffs_to_expected_metrics(capsys):
    from botsort_tpu.cli.eval_mot import main

    rc = main(["--gt", os.path.join(FIX, "ref_trace_synthetic.csv"),
               "--hyp", os.path.join(FIX, "tpu_trace_synthetic.csv")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["FN"] == 1
    assert out["FP"] == 0
    assert out["IDSW"] == 1
    assert out["MOTA"] == pytest.approx(1 - 2 / 30, abs=1e-4)
    assert out["IDF1"] == pytest.approx(48 / 59, abs=1e-4)
    # The 2px shift on track 1 keeps IoU well above the 0.5 gate but
    # must register in MOTP (mean match IoU strictly below 1).
    assert 0.9 < out["MOTP"] < 1.0


def test_self_diff_is_perfect():
    """A trace diffed against itself: MOTA=IDF1=1 — the parity target's
    upper bound (docs/TRACE_PARITY.md)."""
    from botsort_tpu.eval.mot_metrics import evaluate

    p = os.path.join(FIX, "ref_trace_synthetic.csv")
    out = evaluate(p, p)
    assert out["MOTA"] == pytest.approx(1.0)
    assert out["IDF1"] == pytest.approx(1.0)
    assert out["IDSW"] == 0
