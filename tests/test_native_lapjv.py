"""C++ LAPJV vs the scipy exact oracle and the on-device auction."""

import numpy as np
import pytest

from tests.oracle import assignment_np

native = pytest.importorskip("botsort_tpu.runtime.native")

try:
    native.load()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native toolchain unavailable")


def test_matches_scipy_oracle():
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = int(rng.integers(1, 20))
        m = int(rng.integers(1, 20))
        thresh = float(rng.choice([0.5, 0.7, 0.8]))
        cost = rng.uniform(0, 1.2, (n, m))
        got_cfr, got_rfc = native.lapjv_cost_limit(cost, thresh)
        ref_cfr, ref_rfc = assignment_np.lapjv_cost_limit(cost, thresh)
        got_total = assignment_np.total_match_cost(cost, got_cfr, thresh)
        ref_total = assignment_np.total_match_cost(cost, ref_cfr, thresh)
        assert abs(got_total - ref_total) < 1e-9
        for r, c in enumerate(got_cfr):
            if c >= 0:
                assert got_rfc[c] == r


def test_empty():
    cfr, rfc = native.lapjv_cost_limit(np.zeros((0, 4)), 0.8)
    assert cfr.size == 0 and (rfc == -1).all()


def test_threshold():
    cfr, _ = native.lapjv_cost_limit(np.array([[0.9]]), 0.8)
    assert cfr[0] == -1
    cfr, _ = native.lapjv_cost_limit(np.array([[0.5]]), 0.8)
    assert cfr[0] == 0
