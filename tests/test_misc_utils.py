"""StageTimers and importer-CLI degradation."""

import sys
import time

from botsort_tpu.utils.profiling import StageTimers


def test_stage_timers_accumulate():
    t = StageTimers()
    for _ in range(3):
        with t.stage("a"):
            time.sleep(0.01)
    with t.stage("b"):
        pass
    rep = t.report()
    assert 5 < rep["a"] < 100
    assert rep["b"] >= 0
    t.reset()
    assert t.report() == {}


def test_import_onnx_clean_error_on_missing_file(tmp_path):
    # The importer no longer requires the `onnx` package (onnx_lite
    # fallback); a missing input file must still fail cleanly, before
    # any model construction.
    sys.path.insert(0, "tools")
    import import_onnx

    rc = import_onnx.main(["--model", "yolox", "--onnx", "x.onnx",
                           "--out", str(tmp_path / "o")])
    assert rc == 2
