"""Convert reference ONNX weights into botsort_tpu orbax checkpoints.

The reference distributes pretrained ONNX graphs (YOLOX-X detector,
FastReID SBS-S50, face-reidentification-retail-0095) via its GitHub
releases (demo_bottrack_onnx_tflite.py:2007-2047). This tool maps their
initializers onto our Flax parameter trees:

  * Conv weights: OIHW -> HWIO (grouped convs keep the same transpose).
  * BatchNormalization: (scale, B, mean, var) -> flax BatchNorm
    (scale, bias, mean, var).
  * Gemm/MatMul: transposed to flax Dense (in, out).

Matching is structural: ONNX nodes in topological order are paired with
our parameters in module-instantiation order (natural-sorted flax paths),
with shape checking at every step — a mismatch aborts with both
signatures printed, so a silent misload is impossible.

Requires the `onnx` package (NOT bundled in this environment — the tool
degrades to a clear error). Usage:

  python tools/import_onnx.py --model yolox --onnx path/to/detector.onnx \
      --out weights/<model_stem>
"""

from __future__ import annotations

import argparse
import re
import sys

import numpy as np


def natural_key(path_str: str):
    return [int(t) if t.isdigit() else t
            for t in re.split(r"(\d+)", path_str)]


def flatten_flax_params(params):
    """[(path_str, leaf)] in module EXECUTION order.

    Flax builds the params dict during init in call order, and Python
    dicts preserve insertion order — so a plain recursive walk yields
    execution order, which matches the ONNX graph's topological
    initializer order. (jax.tree_util flattening sorts keys
    alphabetically, which would misorder sibling modules — e.g.
    DecoupledHead_0 < PAFPN_0 alphabetically but PAFPN executes first.)
    """
    from collections.abc import Mapping

    entries = []

    def walk(node, prefix):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, prefix + (str(k),))
        else:
            entries.append(("/".join(prefix), node))

    walk(params, ())
    return entries


def extract_onnx_layers(onnx_model):
    """Yield (kind, arrays) tuples in topological node order.

    kind in {conv, bn, gemm}; arrays are numpy weights for that layer.
    """
    import onnx
    from onnx import numpy_helper

    init = {i.name: numpy_helper.to_array(i)
            for i in onnx_model.graph.initializer}
    layers = []
    for node in onnx_model.graph.node:
        if node.op_type == "Conv":
            w = init.get(node.input[1])
            if w is None:
                continue
            b = init.get(node.input[2]) if len(node.input) > 2 else None
            layers.append(("conv", {"kernel": w, "bias": b}))
        elif node.op_type == "BatchNormalization":
            arrs = [init.get(n) for n in node.input[1:5]]
            if any(a is None for a in arrs):
                continue
            scale, bias, mean, var = arrs
            layers.append(("bn", {"scale": scale, "bias": bias,
                                  "mean": mean, "var": var}))
        elif node.op_type in ("Gemm", "MatMul"):
            w = init.get(node.input[1])
            if w is None:
                continue
            b = init.get(node.input[2]) if len(node.input) > 2 else None
            layers.append(("gemm", {"kernel": w, "bias": b}))
    return layers


def assign(flax_entries, onnx_layers):
    """Greedy in-order assignment with shape verification.

    Returns {path: np.ndarray}. Raises on any shape mismatch so a
    silent misload is impossible.
    """
    out = {}

    def take(kind_name, flax_list, onnx_list, emit):
        if len(flax_list) != len(onnx_list):
            raise ValueError(
                f"{kind_name} count mismatch: flax {len(flax_list)} vs "
                f"onnx {len(onnx_list)} — architectures differ")
        for (path, leaf), arrs in zip(flax_list, onnx_list):
            for sub_path, w in emit(path, arrs):
                ref = dict(flax_entries)[sub_path]
                if tuple(w.shape) != tuple(ref.shape):
                    raise ValueError(
                        f"{sub_path}: flax {ref.shape} vs onnx {w.shape}")
                out[sub_path] = w

    # Convolutions: OIHW -> HWIO (grouped convs keep the transpose:
    # ONNX (O, I/g, kH, kW) -> flax (kH, kW, I/g, O)).
    conv_kernels = [(p, l) for p, l in flax_entries
                    if p.endswith("kernel") and l.ndim == 4]
    onnx_convs = [a for k, a in onnx_layers if k == "conv"]
    take("conv", conv_kernels, onnx_convs, lambda path, arrs: (
        [(path, np.transpose(arrs["kernel"], (2, 3, 1, 0)))]
        + ([(path.rsplit("/", 1)[0] + "/bias", arrs["bias"])]
           if arrs["bias"] is not None
           and (path.rsplit("/", 1)[0] + "/bias") in dict(flax_entries)
           else [])))

    # BatchNormalization: (scale, B, mean, var) -> flax BatchNorm
    # (scale, bias, batch_stats mean/var). Flax stores these as four
    # separate leaves under .../BatchNorm_i/{scale,bias} and
    # batch_stats/.../{mean,var}; match by natural order of scale paths.
    bn_scales = [(p, l) for p, l in flax_entries
                 if "/BatchNorm_" in p and p.endswith("scale")]
    onnx_bns = [a for k, a in onnx_layers if k == "bn"]

    def emit_bn(path, arrs):
        base = path.rsplit("/", 1)[0]
        stats_base = base.replace("params/", "batch_stats/", 1)
        return [
            (base + "/scale", arrs["scale"]),
            (base + "/bias", arrs["bias"]),
            (stats_base + "/mean", arrs["mean"]),
            (stats_base + "/var", arrs["var"]),
        ]

    take("batchnorm", bn_scales, onnx_bns, emit_bn)

    # Dense / Gemm: ONNX Gemm weight is (out, in) (transB=1 convention);
    # MatMul weight is (in, out). Flax Dense kernels are (in, out).
    dense_kernels = [(p, l) for p, l in flax_entries
                     if ("/Dense_" in p and p.endswith("kernel"))
                     and l.ndim == 2]
    onnx_dense = [a for k, a in onnx_layers if k == "gemm"]

    def emit_dense(path, arrs):
        w = arrs["kernel"]
        ref = dict(flax_entries)[path]
        if tuple(w.shape) != tuple(ref.shape):
            w = np.transpose(w)
        entries = [(path, w)]
        bias_path = path.rsplit("/", 1)[0] + "/bias"
        if arrs.get("bias") is not None and bias_path in dict(flax_entries):
            entries.append((bias_path, arrs["bias"]))
        return entries

    take("dense", dense_kernels, onnx_dense, emit_dense)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", choices=["yolox", "fastreid", "facereid"],
                        required=True)
    parser.add_argument("--onnx", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    try:
        import onnx  # noqa: F401
    except ImportError:
        print("ERROR: the `onnx` package is not installed in this "
              "environment (no network egress to fetch it). Install onnx "
              "and re-run to convert reference weights.", file=sys.stderr)
        return 2

    import jax
    import jax.numpy as jnp

    from botsort_tpu.models import FaceReID, FastReIDSBS, YOLOX
    from botsort_tpu.runtime.assets import save_checkpoint

    model = {"yolox": YOLOX(num_classes=4, depth=1.33, width=1.25),
             "fastreid": FastReIDSBS(),
             "facereid": FaceReID()}[args.model]
    sample = {"yolox": jnp.zeros((1, 480, 640, 3)),
              "fastreid": jnp.zeros((1, 256, 128, 3)),
              "facereid": jnp.zeros((1, 128, 128, 3))}[args.model]
    params = model.init(jax.random.PRNGKey(0), sample)

    onnx_model = onnx.load(args.onnx)
    layers = extract_onnx_layers(onnx_model)
    assignments = assign(flatten_flax_params(params), layers)

    flat = dict(flatten_flax_params(params))
    for path, value in assignments.items():
        flat[path] = jnp.asarray(value)
    # Rebuild the tree.
    from flax.traverse_util import unflatten_dict

    rebuilt = unflatten_dict({tuple(k.split("/")): v
                              for k, v in flat.items()})
    save_checkpoint(args.out, rebuilt)
    print(f"wrote {args.out} ({len(assignments)} tensors converted)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
