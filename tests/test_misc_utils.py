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


def test_import_onnx_degrades_without_onnx(tmp_path):
    try:
        import onnx  # noqa: F401
        import pytest

        pytest.skip("onnx installed; degradation path not applicable")
    except ImportError:
        pass
    sys.path.insert(0, "tools")
    import import_onnx

    rc = import_onnx.main(["--model", "yolox", "--onnx", "x.onnx",
                           "--out", str(tmp_path / "o")])
    assert rc == 2
