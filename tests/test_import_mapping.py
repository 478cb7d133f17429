"""Importer mapping logic: round-trip a real Flax model's params through
synthetic "ONNX layers" (conv OIHW / BN quads / Gemm) and verify exact
reconstruction. (The onnx package is unavailable in this environment;
this validates everything except the protobuf parsing.)"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tools")
import import_onnx  # noqa: E402

from botsort_tpu.models import FaceReID  # noqa: E402
from botsort_tpu.runtime.assets import MINI  # noqa: E402


def synth_onnx_layers(flax_entries):
    """Build ONNX-style layer arrays in the same natural order the
    importer expects, from the flax params themselves."""
    layers = []
    entries = dict(flax_entries)
    conv_kernels = [(p, l) for p, l in flax_entries
                    if p.endswith("kernel") and l.ndim == 4]
    for path, leaf in conv_kernels:
        bias_path = path.rsplit("/", 1)[0] + "/bias"
        layers.append(("conv", {
            "kernel": np.transpose(np.asarray(leaf), (3, 2, 0, 1)),
            "bias": np.asarray(entries[bias_path])
            if bias_path in entries else None,
        }))
    bn_scales = [(p, l) for p, l in flax_entries
                 if "/BatchNorm_" in p and p.endswith("scale")]
    for path, leaf in bn_scales:
        base = path.rsplit("/", 1)[0]
        stats = base.replace("params/", "batch_stats/", 1)
        layers.append(("bn", {
            "scale": np.asarray(entries[base + "/scale"]),
            "bias": np.asarray(entries[base + "/bias"]),
            "mean": np.asarray(entries[stats + "/mean"]),
            "var": np.asarray(entries[stats + "/var"]),
        }))
    dense = [(p, l) for p, l in flax_entries
             if "/Dense_" in p and p.endswith("kernel") and l.ndim == 2]
    for path, leaf in dense:
        bias_path = path.rsplit("/", 1)[0] + "/bias"
        layers.append(("gemm", {
            "kernel": np.transpose(np.asarray(leaf)),  # (out, in) Gemm
            "bias": np.asarray(entries[bias_path])
            if bias_path in entries else None,
            "transB": 1,
        }))
    return layers


def test_roundtrip_facereid():
    model = FaceReID(**MINI["face"])
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))
    # Randomize so zeros can't hide transpose mistakes.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(0)
    leaves = [jnp.asarray(rng.normal(size=l.shape).astype(np.float32))
              for l in leaves]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    entries = import_onnx.flatten_flax_params(params)
    layers = synth_onnx_layers(entries)
    assignments, report = import_onnx.assign(entries, layers)
    assert report == []

    ref = dict(entries)
    # Every conv/bn/dense leaf must be reconstructed bit-exactly.
    covered = 0
    for path, value in assignments.items():
        np.testing.assert_array_equal(np.asarray(ref[path]), value, path)
        covered += 1
    n_leaves = len(entries)
    assert covered > 0.9 * n_leaves, (covered, n_leaves)


def test_natural_key_ordering():
    paths = ["params/Conv_10/kernel", "params/Conv_2/kernel",
             "params/Conv_1/kernel"]
    ordered = sorted(paths, key=import_onnx.natural_key)
    assert ordered == ["params/Conv_1/kernel", "params/Conv_2/kernel",
                       "params/Conv_10/kernel"]
