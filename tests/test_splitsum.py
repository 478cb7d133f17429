"""Exactness of the concat-free CSP output stage (splitsum).

``concat([a, b]) @ W == a @ W[:h] + b @ W[h:]`` — the CSP layer's
output 1x1 conv is linear in its input channels, so slicing the kernel
and summing is the same math with no concat (models/common.py::
_SplitSumOut). The split path creates its params at the SAME tree
paths (explicit child names ConvBN_2/Conv_0) with the same init
distribution and PRNG folds, so the two variants are checkpoint- and
importer-interchangeable. Production enables it on the detector's
dark2 CSP when the backend is TPU (runtime/assets.py::build_bundle
dgfa gate), where it measured 0.61 -> 0.31 ms on that segment
(docs/PERF.md, tools/perf_probe.py --stages dark2var).

Reference parity context: changes HOW the reference's YOLOX-X backbone
(demo_bottrack_onnx_tflite.py:856-1030 consumes it) executes on TPU,
not its math.
"""

import jax
import jax.numpy as jnp
import numpy as np

from botsort_tpu.models.common import CSPLayer
from botsort_tpu.models.yolox import YOLOX


def test_splitsum_param_tree_and_init_identical():
    base = CSPLayer(16, n=2, dtype=jnp.float32)
    split = CSPLayer(16, n=2, splitsum=True, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 16))
    p0 = jax.jit(base.init)(jax.random.PRNGKey(7), x)
    p1 = jax.jit(split.init)(jax.random.PRNGKey(7), x)
    f0 = jax.tree_util.tree_leaves_with_path(p0)
    f1 = jax.tree_util.tree_leaves_with_path(p1)
    assert [k for k, _ in f0] == [k for k, _ in f1]
    for (_, a), (_, b) in zip(f0, f1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_splitsum_output_exact_f32():
    rng = np.random.default_rng(0)
    base = CSPLayer(24, n=2, dtype=jnp.float32)
    split = CSPLayer(24, n=2, splitsum=True, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (2, 10, 12, 24)), jnp.float32)
    params = jax.jit(base.init)(jax.random.PRNGKey(0), x)
    y0 = jax.jit(base.apply)(params, x)
    y1 = jax.jit(split.apply)(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-6, atol=1e-6)


def test_splitsum_shortcut_false_variant():
    # The PAFPN/dark5 form (shortcut=False) shares the output stage.
    rng = np.random.default_rng(1)
    base = CSPLayer(16, n=1, shortcut=False, dtype=jnp.float32)
    split = CSPLayer(16, n=1, shortcut=False, splitsum=True,
                     dtype=jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (1, 6, 6, 32)), jnp.float32)
    params = jax.jit(base.init)(jax.random.PRNGKey(3), x)
    np.testing.assert_allclose(np.asarray(jax.jit(base.apply)(params, x)),
                               np.asarray(jax.jit(split.apply)(params, x)),
                               rtol=1e-6, atol=1e-6)


def test_yolox_splitsum_dark2_full_model():
    """Whole mini detector: splitsum on dark2 reuses the plain params
    and reproduces decoded boxes/scores. f32 forward: the only delta
    is the split conv's two-partial summation order (~1e-6 rel); a
    bf16 forward would add last-ulp kernel-rounding noise that the
    decode's exp() amplifies into pixels, which says nothing about
    the lowering (the f32 unit tests above prove the math)."""
    rng = np.random.default_rng(2)
    kw = dict(num_classes=4, depth=0.33, width=0.25, dtype=jnp.float32)
    base = YOLOX(**kw)
    split = YOLOX(splitsum_csp=(0,), **kw)
    x = jnp.asarray(rng.uniform(0, 255, (1, 96, 128, 3)), jnp.float32)
    params = jax.jit(base.init)(jax.random.PRNGKey(0), x)
    b0, s0 = jax.jit(base.apply)(params, x)
    b1, s1 = jax.jit(split.apply)(params, x)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1),
                               rtol=1e-3, atol=1e-2)
