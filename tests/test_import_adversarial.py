"""First-contact hardening of the ONNX importer against REALISTIC
export artifacts, on real wire-format binaries (tools/onnx_lite writer):

* a detector graph with the post-processing tail baked in (the
  reference's "post" exports carry NMS/Gather/Concat/Slice decode nodes
  and constant initializers — README.md:183, demo:33-51),
* initializers reaching Conv through Identity nodes,
* fused Conv+BN exports (onnxsim folds BN into the preceding conv, so
  the shipped graphs carry conv biases and few/no BatchNormalization
  nodes) — both fully and PARTIALLY fused (FastReID's BNNeck follows
  pooling, so it survives folding),
* transposed Gemm variants (transB 0/1),
* the end-to-end convert -> orbax checkpoint -> restore -> forward loop
  via import_onnx.main --mini.
"""

import pytest

# Compile-heavy integration module: full tier. The core tier
# (pytest -m 'not slow', <15 min cold) covers the same semantics
# via the cheap unit/oracle tests; run the full tier once per
# round (docs/TESTING.md).
pytestmark = pytest.mark.slow

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tools")
sys.path.insert(0, ".")
import import_onnx  # noqa: E402

from tools import onnx_lite  # noqa: E402
from botsort_tpu.models import FaceReID, FastReIDSBS, YOLOX  # noqa: E402
from botsort_tpu.runtime.assets import MINI  # noqa: E402
from tests.test_import_mapping import synth_onnx_layers  # noqa: E402
from tests.test_onnx_lite import encode_model_from_layers  # noqa: E402


def _random_params(model, sample, seed=0):
    params = model.init(jax.random.PRNGKey(0), sample)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        if "var" in keys or "scale" in keys:
            # Positive variances / near-1 scales keep BN well-behaved.
            arr = rng.uniform(0.5, 1.5, leaf.shape).astype(np.float32)
        else:
            arr = rng.normal(0, 0.05, leaf.shape).astype(np.float32)
        out.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, out)


def _fold_bn_layers(flax_entries, eps):
    """Produce the layer list a (partially) FUSED export would carry:
    each conv-following BatchNorm is folded into its conv (weights
    scaled, bias materialized); BNs not following a conv (e.g. BNNeck)
    stay as real BN nodes."""
    entries = dict(flax_entries)
    order = [p for p, _ in flax_entries]
    layers = []
    last_conv = None       # index into `layers` of the pending conv
    claimed = set()
    for p, leaf in flax_entries:
        if p.endswith("kernel") and leaf.ndim == 4:
            w = np.transpose(np.asarray(leaf), (3, 2, 0, 1))  # OIHW
            bias_path = p.rsplit("/", 1)[0] + "/bias"
            b = (np.asarray(entries[bias_path])
                 if bias_path in entries else None)
            layers.append(["conv", {"kernel": w, "bias": b,
                                    "name": p}])
            last_conv = len(layers) - 1
        elif "/BatchNorm_" in p and p.endswith("scale"):
            base = p.rsplit("/", 1)[0]
            stats = base.replace("params/", "batch_stats/", 1)
            scale = np.asarray(entries[base + "/scale"])
            bias = np.asarray(entries[base + "/bias"])
            mean = np.asarray(entries[stats + "/mean"])
            var = np.asarray(entries[stats + "/var"])
            conv_ok = (last_conv is not None
                       and last_conv not in claimed
                       and layers[last_conv][1]["kernel"].shape[0]
                       == scale.shape[0])
            if conv_ok:
                claimed.add(last_conv)
                inv = scale / np.sqrt(var + eps)
                arrs = layers[last_conv][1]
                arrs["kernel"] = (arrs["kernel"]
                                  * inv[:, None, None, None]
                                  ).astype(np.float32)
                old_b = arrs["bias"] if arrs["bias"] is not None else 0.0
                arrs["bias"] = (bias + (old_b - mean) * inv
                                ).astype(np.float32)
            else:
                layers.append(["bn", {"scale": scale, "bias": bias,
                                      "mean": mean, "var": var,
                                      "name": p}])
        elif "/Dense_" in p and p.endswith("kernel") and leaf.ndim == 2:
            bias_path = p.rsplit("/", 1)[0] + "/bias"
            layers.append(["gemm", {
                "kernel": np.transpose(np.asarray(leaf)),
                "bias": (np.asarray(entries[bias_path])
                         if bias_path in entries else None),
                "transB": 1, "name": p}])
    del order
    return [(k, a) for k, a in layers]


def _encode_with_tail(layers, identity_wrap_conv=0):
    """Wire-encode `layers` with real-export noise: activation nodes
    between layers, one conv weight wrapped in an Identity node, and a
    full post-processing tail (decode constants consumed by Mul/Add,
    Slice/Concat/NonMaxSuppression/Gather) after the last layer."""
    nodes, inits = [], []
    value = "x"
    conv_i = 0
    for idx, (kind, arrs) in enumerate(layers):
        out = f"t{idx}"
        if kind == "conv":
            wname = f"w{idx}"
            inits.append(onnx_lite.encode_tensor(wname, arrs["kernel"]))
            if conv_i == identity_wrap_conv:
                nodes.append(onnx_lite.encode_node(
                    "Identity", [wname], [wname + "_id"],
                    name=f"wrap_{idx}"))
                wname += "_id"
            inputs = [value, wname]
            if arrs.get("bias") is not None:
                bname = f"b{idx}"
                inits.append(onnx_lite.encode_tensor(bname, arrs["bias"]))
                inputs.append(bname)
            nodes.append(onnx_lite.encode_node(
                "Conv", inputs, [out], name=f"conv_{idx}"))
            conv_i += 1
            # Interleave a weightless activation (real graphs have one
            # after nearly every conv).
            nodes.append(onnx_lite.encode_node(
                "Sigmoid", [out], [out + "_act"], name=f"act_{idx}"))
            out += "_act"
        elif kind == "bn":
            names = []
            for part in ("scale", "bias", "mean", "var"):
                nm = f"{part}{idx}"
                inits.append(onnx_lite.encode_tensor(nm, arrs[part]))
                names.append(nm)
            nodes.append(onnx_lite.encode_node(
                "BatchNormalization", [value] + names, [out],
                name=f"bn_{idx}"))
        else:  # gemm
            wname = f"w{idx}"
            inits.append(onnx_lite.encode_tensor(wname, arrs["kernel"]))
            inputs = [value, wname]
            if arrs.get("bias") is not None:
                bname = f"b{idx}"
                inits.append(onnx_lite.encode_tensor(bname, arrs["bias"]))
                inputs.append(bname)
            nodes.append(onnx_lite.encode_node(
                "Gemm", inputs, [out], name=f"gemm_{idx}",
                int_attrs={"transB": int(arrs.get("transB") or 0)}))
        value = out

    # Post-processing tail (YOLOX "post" export shape): grid/stride
    # constants consumed by Mul/Add/Exp decode, Slice with initializer
    # operands, Concat, NonMaxSuppression with its max-output constant,
    # Gather of the selected rows. None of these must surface as a
    # weight layer.
    grid = np.arange(24, dtype=np.float32).reshape(1, 24)
    strides = np.full((1, 24), 8.0, np.float32)
    starts = np.asarray([0], np.int64)
    ends = np.asarray([4], np.int64)
    maxout = np.asarray([20], np.int64)
    for nm, arr in [("grid", grid), ("strides_c", strides),
                    ("starts", starts), ("ends", ends),
                    ("maxout", maxout)]:
        inits.append(onnx_lite.encode_tensor(nm, arr))
    tail = [
        ("Add", [value, "grid"], ["dec_xy"]),
        ("Exp", [value], ["dec_exp"]),
        ("Mul", ["dec_exp", "strides_c"], ["dec_wh"]),
        ("Slice", ["dec_xy", "starts", "ends"], ["dec_xy4"]),
        ("Concat", ["dec_xy4", "dec_wh"], ["dec_boxes"]),
        ("NonMaxSuppression", ["dec_boxes", "dec_xy", "maxout"],
         ["nms_idx"]),
        ("Gather", ["dec_boxes", "nms_idx"], ["final"]),
    ]
    for op, ins, outs in tail:
        nodes.append(onnx_lite.encode_node(op, ins, outs,
                                           name=f"tail_{op}"))
    return onnx_lite.encode_model(nodes, inits)


def test_detector_tail_identity_and_activations(tmp_path):
    """Mini-YOLOX graph + decode tail + Identity-wrapped weight: the
    importer must skip every tail node and still reconstruct all
    weights bit-exactly."""
    model = YOLOX(**MINI["detector"], dtype=jnp.float32)
    sample = jnp.zeros((1, 96, 128, 3))
    params = _random_params(model, sample)
    entries = import_onnx.ordered_flax_entries(model, sample, params)
    layers = synth_onnx_layers(entries)

    path = tmp_path / "det_post.onnx"
    path.write_bytes(_encode_with_tail(layers, identity_wrap_conv=1))

    nodes, init = import_onnx.load_onnx_graph(str(path))
    parsed = import_onnx.extract_onnx_layers(nodes, init)
    assert [k for k, _ in parsed] == [k for k, _ in layers], \
        "tail nodes leaked into the layer list"

    assignments, report = import_onnx.assign(entries, parsed)
    assert report == []
    ref = dict(entries)
    for p, v in assignments.items():
        np.testing.assert_array_equal(np.asarray(ref[p]), v, p)


def test_fused_bn_facereid_bitexact(tmp_path):
    """FULLY fused export (every BN folded): import must synthesize
    identity BNs carrying the folded biases, making the restored model
    match the original to float32 tolerance."""
    eps = 1e-5
    model = FaceReID(**MINI["face"], dtype=jnp.float32)
    sample = jnp.asarray(
        np.random.default_rng(3).uniform(0, 255, (2, 32, 32, 3)),
        jnp.float32)
    params = _random_params(model, sample)
    entries = import_onnx.ordered_flax_entries(model, sample, params)
    fused = _fold_bn_layers(entries, eps)
    assert not any(k == "bn" for k, _ in fused), \
        "facereid should fold every BN (all conv-following)"

    path = tmp_path / "face_fused.onnx"
    path.write_bytes(encode_model_from_layers(fused))
    nodes, init = import_onnx.load_onnx_graph(str(path))
    parsed = import_onnx.extract_onnx_layers(nodes, init)

    assignments, report = import_onnx.assign(entries, parsed,
                                             fused_bn_eps=eps)
    assert any("fused Conv+BN" in line for line in report)

    flat = dict(entries)
    flat.update({p: jnp.asarray(v) for p, v in assignments.items()})
    from flax.traverse_util import unflatten_dict

    rebuilt = unflatten_dict({tuple(k.split("/")): v
                              for k, v in flat.items()})
    want = model.apply(params, sample)
    got = model.apply(rebuilt, sample)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_partial_fused_bn_fastreid_bitexact(tmp_path):
    """PARTIALLY fused export: conv-following BNs folded, the BNNeck
    (follows GeM pooling — unfoldable) kept as a real BN node."""
    eps = 1e-5
    model = FastReIDSBS(**MINI["body"], dtype=jnp.float32)
    sample = jnp.asarray(
        np.random.default_rng(4).normal(0, 1, (2, 64, 32, 3)),
        jnp.float32)
    params = _random_params(model, sample)
    entries = import_onnx.ordered_flax_entries(model, sample, params)
    fused = _fold_bn_layers(entries, eps)
    n_real_bn = sum(1 for k, _ in fused if k == "bn")
    assert n_real_bn >= 1, "BNNeck should survive folding"

    path = tmp_path / "body_fused.onnx"
    path.write_bytes(encode_model_from_layers(fused))
    nodes, init = import_onnx.load_onnx_graph(str(path))
    parsed = import_onnx.extract_onnx_layers(nodes, init)

    assignments, report = import_onnx.assign(entries, parsed,
                                             fused_bn_eps=eps)
    assert any("fused Conv+BN" in line for line in report)
    assert any(f"{n_real_bn} real BN nodes kept" in line
               for line in report)

    flat = dict(entries)
    flat.update({p: jnp.asarray(v) for p, v in assignments.items()})
    from flax.traverse_util import unflatten_dict

    rebuilt = unflatten_dict({tuple(k.split("/")): v
                              for k, v in flat.items()})
    want = model.apply(params, sample)
    got = model.apply(rebuilt, sample)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_gemm_transb_variants():
    """transB=0 stores (in, out); transB=1 stores (out, in). Both must
    land in flax (in, out)."""
    model = FaceReID(**MINI["face"])
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    entries = import_onnx.flatten_flax_params(params)
    layers = synth_onnx_layers(entries)
    flipped = []
    for k, a in layers:
        if k == "gemm":
            a = dict(a)
            # synth emits transB=1/(out,in); flip to transB=0/(in,out).
            a["kernel"] = np.transpose(a["kernel"])
            a["transB"] = 0
        flipped.append((k, a))
    assignments, report = import_onnx.assign(entries, flipped)
    assert report == []
    ref = dict(entries)
    for p, v in assignments.items():
        np.testing.assert_array_equal(np.asarray(ref[p]), v, p)


def test_main_mini_convert_restore_forward(tmp_path, capsys):
    """The full CLI loop on a wire binary: import_onnx.main --mini
    converts -> orbax checkpoint -> build_bundle restores it -> the
    restored model runs. Proves convert/restore/serve end-to-end without
    the real release files (environment has no egress)."""
    from botsort_tpu.runtime.assets import (
        DEFAULT_FACE_REID,
        build_bundle,
    )

    model = FaceReID(**MINI["face"])
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    entries = import_onnx.flatten_flax_params(params)
    layers = synth_onnx_layers(entries)
    onnx_path = tmp_path / "face.onnx"
    onnx_path.write_bytes(encode_model_from_layers(layers))

    import os

    stem = os.path.splitext(DEFAULT_FACE_REID)[0]
    out_dir = tmp_path / "weights" / stem
    rc = import_onnx.main([
        "--model", "facereid", "--mini", "--onnx", str(onnx_path),
        "--out", str(out_dir), "--selfcheck"])
    assert rc == 0
    out = capsys.readouterr()
    assert "tensors converted" in out.out
    assert "selfcheck output[0]" in out.out
    assert out_dir.is_dir()

    bundle = build_bundle(weights_dir=str(tmp_path / "weights"),
                          mini=True)
    err = capsys.readouterr().err
    # The face model must have restored (no random-init warning for it).
    assert f"no checkpoint at {tmp_path / 'weights' / stem}" not in err
    feats = bundle.face_encoder.apply(
        bundle.face_params, jnp.zeros((1, 32, 32, 3)))
    assert np.asarray(feats).shape[-1] == model.feature_dim
