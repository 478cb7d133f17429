"""The folded Focus stem (6x6/s2 conv) must be bit-equivalent to the
reference's space-to-depth + 3x3 conv semantics
(models/common.py::Focus; weight map tools/import_onnx.py::
focus_weight_to_conv6)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tools")
import import_onnx  # noqa: E402

from botsort_tpu.models.common import Focus  # noqa: E402


def _params_path(params, *keys):
    node = params
    for k in keys:
        node = node[k]
    return node


def test_folded_focus_matches_space_to_depth():
    rng = np.random.default_rng(0)
    feats = 8
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 20, 3)), jnp.float32)

    ref = Focus(feats, 3, fold=False, dtype=jnp.float32)
    ref_params = ref.init(jax.random.PRNGKey(0), x)
    # Randomize the 3x3x12 kernel + BN params.
    w3 = rng.normal(0, 0.5, (3, 3, 12, feats)).astype(np.float32)
    kp = dict(ref_params["params"]["ConvBN_0"])
    kp["Conv_0"] = {"kernel": jnp.asarray(w3)}
    bn = {"scale": jnp.asarray(rng.uniform(0.5, 1.5, feats), jnp.float32),
          "bias": jnp.asarray(rng.normal(0, 1, feats), jnp.float32)}
    bn_stats = {"mean": jnp.asarray(rng.normal(0, 1, feats), jnp.float32),
                "var": jnp.asarray(rng.uniform(0.5, 2, feats),
                                   jnp.float32)}
    ref_params = {
        "params": {"ConvBN_0": {"Conv_0": {"kernel": jnp.asarray(w3)},
                                "BatchNorm_0": bn}},
        "batch_stats": {"ConvBN_0": {"BatchNorm_0": bn_stats}},
    }
    want = ref.apply(ref_params, x)

    # Fold: flax HWIO (3,3,12,F) -> ONNX OIHW (F,12,3,3) -> 6x6 HWIO.
    w_oihw = np.transpose(w3, (3, 2, 0, 1))
    w6 = import_onnx.focus_weight_to_conv6(w_oihw)
    assert w6.shape == (6, 6, 3, feats)
    folded = Focus(feats, 3, fold=True, dtype=jnp.float32)
    folded_params = {
        "params": {"Conv_0": {"kernel": jnp.asarray(w6)},
                   "BatchNorm_0": bn},
        "batch_stats": {"BatchNorm_0": bn_stats},
    }
    got = folded.apply(folded_params, x)
    assert got.shape == want.shape == (2, 8, 10, feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_importer_remaps_focus_conv_through_assign():
    """A real-export-shaped conv (O,12,3,3) must land on the folded
    (6,6,3,O) flax kernel via assign's shape-triggered remap."""
    rng = np.random.default_rng(1)
    feats = 8
    model = Focus(feats, 3, fold=True, dtype=jnp.float32)
    sample = jnp.zeros((1, 16, 20, 3))
    params = model.init(jax.random.PRNGKey(0), sample)
    entries = import_onnx.ordered_flax_entries(model, sample, params)

    w_oihw = rng.normal(0, 0.5, (feats, 12, 3, 3)).astype(np.float32)
    layers = [("conv", {"kernel": w_oihw, "bias": None, "name": "stem"}),
              ("bn", {"scale": np.ones(feats, np.float32),
                      "bias": np.zeros(feats, np.float32),
                      "mean": np.zeros(feats, np.float32),
                      "var": np.ones(feats, np.float32),
                      "name": "stem_bn"})]
    assignments, report = import_onnx.assign(entries, layers)
    assert report == []
    got = assignments["params/Conv_0/kernel"]
    np.testing.assert_array_equal(
        got, import_onnx.focus_weight_to_conv6(w_oihw))
