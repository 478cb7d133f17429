"""Exactness of the face encoder's Pallas depthwise stencil lowering.

`FaceReID(dw_mode="pallas")` computes every stride-1 depthwise 3x3 in
one VMEM-resident Pallas stencil (models/facereid_pallas.py) and keeps
the XLA grouped conv for the stride-2 blocks — same math, IDENTICAL
param tree. Mirrors tests/test_facereid_shift.py: in float32 the only
noise is summation order.
"""

import numpy as np
import jax
import jax.numpy as jnp

from botsort_tpu.models.facereid import FaceReID
from botsort_tpu.models.facereid_pallas import dw_conv3x3_same

MINI_LAYOUT = ((1, 8, 1, 1), (6, 12, 2, 2), (6, 16, 2, 2))


def test_dw_op_matches_grouped_conv():
    rng = np.random.default_rng(5)
    for n, h, w, c in ((2, 8, 8, 16), (1, 9, 13, 8), (4, 6, 10, 130)):
        x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 1, c)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
        got = dw_conv3x3_same(x, k, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)


def test_pallas_lowering_matches_grouped_conv():
    conv = FaceReID(feature_dim=16, layout=MINI_LAYOUT, head_width=32,
                    dtype=jnp.float32, dw_mode="conv")
    pall = FaceReID(feature_dim=16, layout=MINI_LAYOUT, head_width=32,
                    dtype=jnp.float32, dw_mode="pallas")
    x = jnp.asarray(
        np.random.default_rng(11).uniform(0, 255, (3, 32, 32, 3)),
        jnp.float32)
    params = jax.jit(conv.init)(jax.random.PRNGKey(0), x)
    # Identical param trees (paths AND shapes) — checkpoints and the
    # importer must not see the lowering.
    flat_c = jax.tree_util.tree_leaves_with_path(params)
    params_p = jax.eval_shape(pall.init, jax.random.PRNGKey(0), x)
    flat_p = jax.tree_util.tree_leaves_with_path(params_p)
    assert [(jax.tree_util.keystr(k), v.shape) for k, v in flat_c] \
        == [(jax.tree_util.keystr(k), v.shape) for k, v in flat_p]
    out_c = jax.jit(conv.apply)(params, x)
    out_p = jax.jit(pall.apply)(params, x)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_p),
                               rtol=0, atol=2e-5)
