"""Parity of the fused stem+stage-1 Pallas kernel
(models/fastreid_pallas.py) against the plain Flax path.

The kernel is weight-exact up to bf16 rounding: it consumes the SAME
variable trees as models/fastreid.py's modules (BN folded to
scale/bias, weights pair-packed), so any drift in either side's math
breaks these tests. Runs in interpret mode on CPU (stem_stage1
auto-selects interpret off-TPU).
"""

import pytest

# Compile-heavy integration module: full tier. The core tier
# (pytest -m 'not slow', <15 min cold) covers the same semantics
# via the cheap unit/oracle tests; run the full tier once per
# round (docs/TESTING.md).
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from botsort_tpu.models.fastreid import ResNeSt50


SMALL = dict(stage_blocks=(3, 1, 1, 1), stage_widths=(8, 16, 32, 64),
             stem_width=8)


def _perturbed_vars(model, x, seed=0):
    """init, then randomize every param + BN stat so BN folding and
    scale/bias application are actually exercised (init's zeros/ones
    would hide sign and scale bugs)."""
    variables = model.init(jax.random.PRNGKey(seed), x)
    rng = np.random.default_rng(seed + 1)

    def perturb(leaf):
        a = np.asarray(leaf, np.float32)
        new = rng.normal(0.1, 0.4, a.shape).astype(np.float32)
        return jnp.asarray(new, leaf.dtype)

    def perturb_var(leaf):
        a = np.asarray(leaf, np.float32)
        new = rng.uniform(0.3, 1.8, a.shape).astype(np.float32)
        return jnp.asarray(new, leaf.dtype)

    params = jax.tree_util.tree_map(perturb, variables["params"])
    stats = jax.tree_util.tree_map_with_path(
        lambda p, l: perturb_var(l) if p[-1].key == "var" else perturb(l),
        variables["batch_stats"])
    return {"params": params, "batch_stats": stats}


def test_fused_stem_stage1_matches_flax():
    x = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (2, 32, 16, 3)),
        jnp.bfloat16)
    plain = ResNeSt50(**SMALL, dtype=jnp.bfloat16, fused_stem=False)
    fused = ResNeSt50(**SMALL, dtype=jnp.bfloat16, fused_stem=True)
    variables = _perturbed_vars(plain, x)

    want = np.asarray(plain.apply(variables, x), np.float32)
    got = np.asarray(fused.apply(variables, x), np.float32)

    assert got.shape == want.shape
    # bf16 rounding accumulates differently (kernel applies folded BN in
    # f32 on the accumulator; Flax computes BN in bf16) — compare by
    # relative error norm, not elementwise bits.
    denom = np.linalg.norm(want) + 1e-6
    rel = np.linalg.norm(got - want) / denom
    assert rel < 3e-2, f"relative error {rel:.4f}"
    # and no gross elementwise outliers
    scale = np.abs(want).max() + 1e-6
    assert np.max(np.abs(got - want)) / scale < 0.15


def test_param_trees_identical_between_modes():
    """fused_stem must not change the variable tree (explicit names pin
    the compact auto-naming), so one checkpoint serves both paths."""
    x = jnp.zeros((1, 32, 16, 3), jnp.bfloat16)
    v_plain = ResNeSt50(**SMALL, dtype=jnp.bfloat16,
                        fused_stem=False).init(jax.random.PRNGKey(0), x)
    v_fused = ResNeSt50(**SMALL, dtype=jnp.bfloat16,
                        fused_stem=True).init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v_plain)
            == jax.tree_util.tree_structure(v_fused))
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(v_plain),
            jax.tree_util.tree_leaves_with_path(v_fused)):
        assert pa == pb and la.shape == lb.shape


def test_unsupported_geometry_falls_back():
    """W not divisible by 8 -> geometry_ok False -> plain path (still
    correct, just unfused). Uses apply only (init always plain)."""
    from botsort_tpu.models.fastreid_pallas import geometry_ok
    assert not geometry_ok(32, 12)
    assert geometry_ok(256, 128)
    assert geometry_ok(384, 128)
    x = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (1, 32, 12, 3)),
        jnp.bfloat16)
    plain = ResNeSt50(**SMALL, dtype=jnp.bfloat16, fused_stem=False)
    fused = ResNeSt50(**SMALL, dtype=jnp.bfloat16, fused_stem=True)
    variables = _perturbed_vars(plain, x)
    want = np.asarray(plain.apply(variables, x), np.float32)
    got = np.asarray(fused.apply(variables, x), np.float32)
    np.testing.assert_array_equal(got, want)
