"""Exactness of the SplAt dgfa lowering (models/fastreid.py).

dense_groups lowers the radix-2 grouped conv as ONE plain conv with a
block-diagonal kernel built from the same params (bit-exact: the extra
products are exact zeros); flat_attention computes the radix softmax +
combine on lane slices instead of a rank-5 split view (same math; the
softmax normalization runs in f32 with a slightly different op order,
so tolerance is ~1e-3 on L2-normalized embeddings). Both are apply-time
lowerings of the SAME param tree — production enables them on the first
two stages when the backend is TPU (runtime/assets.py::build_bundle
dgfa auto-gate), where they measured -18% full-encoder time at b64 on
v5e (docs/PERF.md); on CPU the default is off (idle-lane filling is a
pure loss there).

Reference parity context: this only changes HOW the reference's
mot17_sbs_S50 backbone (demo_bottrack_onnx_tflite.py:1032-1142
consumes it) executes on TPU, not its math.
"""

# Compile-heavy integration module: full tier. The core tier
# (pytest -m 'not slow', <15 min cold) covers the same semantics
# via the cheap unit/oracle tests; run the full tier once per
# round (docs/TESTING.md).
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botsort_tpu.models.fastreid import FastReIDSBS, SplAtConv

MINI = dict(stage_blocks=(2, 2, 2, 2), stage_widths=(16, 32, 64, 128),
            stem_width=8, feature_dim=128)


@pytest.fixture(scope="module")
def mini_model():
    base = FastReIDSBS(**MINI)
    params = jax.jit(base.init)(jax.random.PRNGKey(0),
                                jnp.zeros((2, 64, 32, 3)))
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (2, 64, 32, 3)),
                    jnp.float32)
    ref = jax.jit(base.apply)(params, x)
    return params, x, ref


def test_dense_groups_bit_exact_splatconv():
    conv = SplAtConv(16)
    params = jax.jit(conv.init)(jax.random.PRNGKey(1),
                                jnp.zeros((2, 8, 8, 16)))
    x = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (2, 8, 8, 16)),
                    jnp.float32)
    ref = jax.jit(conv.apply)(params, x)
    out = jax.jit(SplAtConv(16, dense_groups=True).apply)(params, x)
    assert jnp.array_equal(ref, out)


def test_flat_attention_close_splatconv():
    conv = SplAtConv(16)
    params = jax.jit(conv.init)(jax.random.PRNGKey(2),
                                jnp.zeros((2, 8, 8, 16)))
    x = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (2, 8, 8, 16)),
                    jnp.float32)
    ref = np.asarray(jax.jit(conv.apply)(params, x), np.float32)
    out = np.asarray(jax.jit(
        SplAtConv(16, flat_attention=True).apply)(params, x), np.float32)
    # bf16 activations; only the f32 softmax op order differs.
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=0)


def test_full_encoder_dgfa_stages(mini_model):
    params, x, ref = mini_model
    out = jax.jit(FastReIDSBS(dgfa_stages=(0, 1), **MINI).apply)(params, x)
    # Embeddings are L2-normalized f32.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=0)


def test_param_tree_identical(mini_model):
    params, _, _ = mini_model
    shapes = jax.tree.map(jnp.shape, params)
    shapes2 = jax.tree.map(
        jnp.shape,
        jax.jit(FastReIDSBS(dgfa_stages=(0, 1, 2, 3), **MINI).init)(
            jax.random.PRNGKey(0), jnp.zeros((2, 64, 32, 3))))
    assert shapes == shapes2


def test_build_bundle_dgfa_gate():
    """dgfa auto-gates on the backend: the MXU-lane-filling trick is a
    pure loss on CPU (and large dense-grouped convs have segfaulted
    XLA:CPU's LLVM JIT in long-lived many-program processes), so the
    default is off here (tests force CPU) and the explicit override
    still wires the stages through."""
    from botsort_tpu.runtime.assets import build_bundle

    bundle = build_bundle(mini=True, fake_params=True)
    assert bundle.body_encoder.dgfa_stages == ()
    bundle = build_bundle(mini=True, fake_params=True, dgfa=True)
    assert bundle.body_encoder.dgfa_stages == (0, 1)


def test_int8_mid_reverts_dgfa_inside_scope():
    """quantize_bundle scope='mid' must not leave dgfa stages inside the
    int8 scope (the dense lowering bypasses the nn.Conv interceptor)."""
    from botsort_tpu.models.quantize import quantize_bundle
    from botsort_tpu.runtime.assets import build_bundle

    bundle = build_bundle(mini=True, fake_params=True, dgfa=True)
    q = quantize_bundle(bundle, which=("body",), scope="mid",
                        num_calib=1)
    inner = getattr(q.body_encoder, "module", q.body_encoder)
    assert inner.dgfa_stages == (0,)
