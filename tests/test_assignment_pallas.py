"""Pallas JV kernel (interpret mode) vs the XLA JV solver.

The real kernel runs on TPU (enabled by default in solve_masked);
interpret mode validates the kernel's logic on the CPU backend.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from botsort_tpu.ops.assignment import _jv_masked
from botsort_tpu.ops.assignment_pallas import jv_solve_pallas


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_matches_xla_solver(seed):
    rng = np.random.default_rng(seed)
    s = 24
    ext = jnp.asarray(rng.random((s, s)).astype(np.float32))
    n_live = int(rng.integers(3, 10))
    parked = jnp.zeros(s, dtype=bool).at[n_live:].set(True)
    pcol = jnp.arange(s, dtype=jnp.int32)

    got = np.asarray(jv_solve_pallas(ext, parked, pcol, max_iters=512,
                                     interpret=True))
    want = np.asarray(_jv_masked(ext, parked, pcol, 512))

    # Both are optimal; compare objective (ties may differ).
    cost_got = sum(float(ext[got[j], j]) for j in range(s))
    cost_want = sum(float(ext[want[j], j]) for j in range(s))
    assert abs(cost_got - cost_want) < 1e-4
    # Every column owned, ownership a permutation.
    assert sorted(got.tolist()) == list(range(s))


def test_vmapped_kernel_matches_per_instance():
    """vmap must route through the kernel's custom batching rule (one
    B-step grid) and agree with per-instance solves — the multi-stream
    cascade path (frame_step_batched vmaps tracker_update)."""
    import jax

    rng = np.random.default_rng(3)
    b, s = 5, 24
    ext = jnp.asarray(rng.random((b, s, s)).astype(np.float32))
    parked = jnp.zeros((b, s), dtype=bool).at[:, 9:].set(True)
    pcol = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))

    solve = lambda e, p, c: jv_solve_pallas(e, p, c, max_iters=512,
                                            interpret=True)
    got = np.asarray(jax.vmap(solve)(ext, parked, pcol))
    for i in range(b):
        want = np.asarray(solve(ext[i], parked[i], pcol[i]))
        cost_got = sum(float(ext[i, got[i, j], j]) for j in range(s))
        cost_want = sum(float(ext[i, want[j], j]) for j in range(s))
        assert abs(cost_got - cost_want) < 1e-4
        assert sorted(got[i].tolist()) == list(range(s))
