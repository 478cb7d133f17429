"""The dependency-free ONNX wire-format reader, tested on REAL protobuf
bytes: fixtures are encoded with tools/onnx_lite's writer (the same wire
format the onnx package produces), written to disk as .onnx files, and
read back through the importer's full load -> extract -> assign path.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tools")
sys.path.insert(0, ".")
import import_onnx  # noqa: E402

from tools import onnx_lite  # noqa: E402
from botsort_tpu.models import FaceReID  # noqa: E402
from botsort_tpu.runtime.assets import MINI  # noqa: E402


def encode_model_from_layers(layers):
    """Build real .onnx bytes for a (kind, arrays) layer list."""
    nodes, inits = [], []
    value = "x"
    for idx, (kind, arrs) in enumerate(layers):
        if kind == "conv":
            wname = f"w{idx}"
            inits.append(onnx_lite.encode_tensor(wname, arrs["kernel"]))
            inputs = [value, wname]
            if arrs.get("bias") is not None:
                bname = f"b{idx}"
                inits.append(onnx_lite.encode_tensor(bname, arrs["bias"]))
                inputs.append(bname)
            out = f"t{idx}"
            nodes.append(onnx_lite.encode_node(
                "Conv", inputs, [out], name=f"conv_{idx}"))
        elif kind == "bn":
            names = []
            for part in ("scale", "bias", "mean", "var"):
                nm = f"{part}{idx}"
                inits.append(onnx_lite.encode_tensor(nm, arrs[part]))
                names.append(nm)
            out = f"t{idx}"
            nodes.append(onnx_lite.encode_node(
                "BatchNormalization", [value] + names, [out],
                name=f"bn_{idx}"))
        elif kind == "gemm":
            wname = f"w{idx}"
            inits.append(onnx_lite.encode_tensor(wname, arrs["kernel"]))
            inputs = [value, wname]
            if arrs.get("bias") is not None:
                bname = f"b{idx}"
                inits.append(onnx_lite.encode_tensor(bname, arrs["bias"]))
                inputs.append(bname)
            out = f"t{idx}"
            nodes.append(onnx_lite.encode_node(
                "Gemm", inputs, [out], name=f"gemm_{idx}",
                int_attrs={"transB": int(arrs.get("transB") or 0)}))
        value = out
    return onnx_lite.encode_model(nodes, inits)


def _random_facereid_entries():
    from tests.test_import_mapping import synth_onnx_layers

    model = FaceReID(**MINI["face"])
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(1)
    leaves = [jnp.asarray(rng.normal(size=l.shape).astype(np.float32))
              for l in leaves]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    entries = import_onnx.flatten_flax_params(params)
    return entries, synth_onnx_layers(entries)


def test_wire_roundtrip_through_importer(tmp_path):
    entries, layers = _random_facereid_entries()
    path = tmp_path / "model.onnx"
    path.write_bytes(encode_model_from_layers(layers))

    nodes, init = import_onnx.load_onnx_graph(str(path))
    parsed_layers = import_onnx.extract_onnx_layers(nodes, init)
    kinds = [k for k, _ in parsed_layers]
    assert kinds == [k for k, _ in layers]

    assignments, report = import_onnx.assign(entries, parsed_layers)
    assert report == []
    ref = dict(entries)
    covered = 0
    for p, v in assignments.items():
        np.testing.assert_array_equal(np.asarray(ref[p]), v, p)
        covered += 1
    assert covered > 0.9 * len(entries)


def test_wire_parses_attributes_and_names(tmp_path):
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    data = onnx_lite.encode_model(
        [onnx_lite.encode_node("Gemm", ["x", "w"], ["y"], name="head",
                               int_attrs={"transB": 1})],
        [onnx_lite.encode_tensor("w", w)])
    path = tmp_path / "gemm.onnx"
    path.write_bytes(data)
    model = onnx_lite.load(str(path))
    (node,) = model.graph.node
    assert node.op_type == "Gemm"
    assert node.name == "head"
    assert node.attr_i("transB") == 1
    (tensor,) = model.graph.initializer
    assert tensor.name == "w"
    np.testing.assert_array_equal(tensor.array, w)


def test_wire_int64_and_float16_tensors(tmp_path):
    arrs = [np.asarray([1, -2, 3], dtype=np.int64),
            np.asarray([[0.5, -1.25]], dtype=np.float16)]
    data = onnx_lite.encode_model(
        [], [onnx_lite.encode_tensor(f"t{i}", a)
             for i, a in enumerate(arrs)])
    model = onnx_lite.parse(data)
    for t, a in zip(model.graph.initializer, arrs):
        np.testing.assert_array_equal(t.array, a)
        assert t.array.dtype == a.dtype


def test_lenient_lcs_alignment_survives_extra_onnx_layer():
    entries, layers = _random_facereid_entries()
    # Simulate an export artifact: one extra conv the flax model lacks.
    extra = ("conv", {"kernel": np.zeros((7, 7, 3, 3), np.float32),
                      "bias": None, "name": "ghost"})
    conv_positions = [i for i, (k, _) in enumerate(layers) if k == "conv"]
    layers_bad = list(layers)
    layers_bad.insert(conv_positions[1], extra)

    # Strict mode aborts...
    try:
        import_onnx.assign(entries, layers_bad)
        raise AssertionError("strict assign should have raised")
    except ValueError as e:
        assert "count mismatch" in str(e)

    # ...lenient mode aligns everything else and reports the ghost.
    assignments, report = import_onnx.assign(entries, layers_bad,
                                             strict=False)
    assert any("ghost" in line for line in report)
    ref = dict(entries)
    for p, v in assignments.items():
        np.testing.assert_array_equal(np.asarray(ref[p]), v, p)


def test_dump_manifest_runs(capsys):
    entries, layers = _random_facereid_entries()
    import_onnx.dump_manifest(entries, layers)
    out = capsys.readouterr().out
    assert "== conv" in out and "== gemm" in out
