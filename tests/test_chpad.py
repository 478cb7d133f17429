"""CSPLayer chpad lowering: identical param tree, same math.

chpad runs the CSP hidden bottleneck chain channel-padded to the
128-lane boundary with zero-extended kernels (models/common.py::
ConvBN.pad_in/pad_out) — a pure MXU-occupancy lowering of the same
function, like dgfa (fastreid) and splitsum. The padded channels carry
act(BN_pad(0)) = 0 and every consumer kernel has zero rows there, so
the real channels match the plain layer up to bf16/f32 accumulation
order (the reference has no analog — its TensorRT engines pick
equivalent tactics internally; demo_bottrack_onnx_tflite.py:753-783).
"""

import jax
import jax.numpy as jnp
import numpy as np

from botsort_tpu.models.common import CSPLayer


def _trees_match(a, b):
    if jax.tree_util.tree_structure(a) != jax.tree_util.tree_structure(b):
        return False
    return all(x.shape == y.shape and x.dtype == y.dtype
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_chpad_param_tree_identical():
    x = jnp.zeros((1, 8, 8, 160))
    p_plain = CSPLayer(160, 2).init(jax.random.PRNGKey(0), x)
    p_chpad = CSPLayer(160, 2, chpad=True).init(jax.random.PRNGKey(0), x)
    assert _trees_match(p_plain, p_chpad)


def test_chpad_matches_plain_f32():
    rng = jax.random.PRNGKey(1)
    x = jax.random.uniform(rng, (2, 12, 16, 160))
    plain = CSPLayer(160, 4, dtype=jnp.float32)
    chp = CSPLayer(160, 4, chpad=True, dtype=jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), x)
    y1 = plain.apply(params, x)
    y2 = chp.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=0, atol=1e-5)


def test_chpad_matches_plain_bf16():
    rng = jax.random.PRNGKey(2)
    x = jax.random.uniform(rng, (2, 12, 16, 160))
    plain = CSPLayer(160, 4)
    chp = CSPLayer(160, 4, chpad=True)
    ss_chp = CSPLayer(160, 4, splitsum=True, chpad=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    y1 = np.asarray(plain.apply(params, x), np.float32)
    for variant in (chp, ss_chp):
        y2 = np.asarray(variant.apply(params, x), np.float32)
        # bf16 accumulation-order tolerance (a few ulps at |y| ~ 1).
        np.testing.assert_allclose(y1, y2, rtol=0, atol=0.05)


def test_chpad_nonmultiple_hidden():
    """Hidden width that is not a divisor of 128 (e.g. 48) pads too."""
    rng = jax.random.PRNGKey(3)
    x = jax.random.uniform(rng, (1, 8, 8, 96))
    plain = CSPLayer(96, 2, dtype=jnp.float32)
    chp = CSPLayer(96, 2, chpad=True, dtype=jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(plain.apply(params, x)),
        np.asarray(chp.apply(params, x)), rtol=0, atol=1e-5)
