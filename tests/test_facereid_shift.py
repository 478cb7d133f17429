"""Exactness of the face encoder's shift-sum depthwise lowering.

`FaceReID(dw_mode="shift")` computes every depthwise 3x3 as 9 weighted
strided-slice FMAs instead of a grouped conv (models/facereid.py::
_DWConvShift) — same math, IDENTICAL param tree. XLA's grouped-conv
lowering is the encoder's VPU bottleneck on v5e (docs/PERF.md); this
test pins that the alternative lowering is a pure lowering swap: both
paths must agree on the same params, including strided blocks and the
residual-carrying stride-1 blocks, in float32 where the only noise is
summation order.
"""

import numpy as np
import jax
import jax.numpy as jnp

from botsort_tpu.models.facereid import FaceReID, MOBILENETV2_LAYOUT

MINI_LAYOUT = ((1, 8, 1, 1), (6, 12, 2, 2), (6, 16, 2, 2))


def test_shift_lowering_matches_grouped_conv():
    conv = FaceReID(feature_dim=16, layout=MINI_LAYOUT, head_width=32,
                    dtype=jnp.float32, dw_mode="conv")
    shift = FaceReID(feature_dim=16, layout=MINI_LAYOUT, head_width=32,
                     dtype=jnp.float32, dw_mode="shift")
    x = jnp.asarray(
        np.random.default_rng(11).uniform(0, 255, (3, 32, 32, 3)),
        jnp.float32)
    params = jax.jit(conv.init)(jax.random.PRNGKey(0), x)
    # Identical param trees (paths AND shapes) — checkpoints and the
    # importer must not see the lowering.
    flat_c = jax.tree_util.tree_leaves_with_path(params)
    params_s = jax.eval_shape(shift.init, jax.random.PRNGKey(0), x)
    flat_s = jax.tree_util.tree_leaves_with_path(params_s)
    assert [(jax.tree_util.keystr(k), v.shape) for k, v in flat_c] \
        == [(jax.tree_util.keystr(k), v.shape) for k, v in flat_s]
    out_c = jax.jit(conv.apply)(params, x)
    out_s = jax.jit(shift.apply)(params, x)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_s),
                               rtol=0, atol=2e-5)


def test_shift_lowering_odd_spatial_stride2():
    """SAME padding at odd spatial + stride 2 (the 128->64->32->16->8->4
    chain stays even, but crops from future geometries may not)."""
    conv = FaceReID(feature_dim=8, layout=((6, 8, 1, 2),), head_width=16,
                    dtype=jnp.float32, dw_mode="conv")
    shift = FaceReID(feature_dim=8, layout=((6, 8, 1, 2),), head_width=16,
                     dtype=jnp.float32, dw_mode="shift")
    x = jnp.asarray(
        np.random.default_rng(3).uniform(0, 255, (2, 27, 21, 3)),
        jnp.float32)
    params = jax.jit(conv.init)(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(jax.jit(conv.apply)(params, x)),
        np.asarray(jax.jit(shift.apply)(params, x)),
        rtol=0, atol=2e-5)


def test_full_layout_is_even_chain():
    # The production 128x128 input halves cleanly through every stride-2
    # block, so the ceil-div output shapes in _DWConvShift match
    # nn.Conv SAME for the real geometry by construction.
    h = 64  # after the stride-2 stem
    for _, _, _, stride in MOBILENETV2_LAYOUT:
        assert h % stride == 0
        h //= stride
