"""Convert reference ONNX weights into botsort_tpu orbax checkpoints.

The reference distributes pretrained ONNX graphs (YOLOX-X detector,
FastReID SBS-S50, face-reidentification-retail-0095) via its GitHub
releases (demo_bottrack_onnx_tflite.py:2007-2047). This tool maps their
initializers onto our Flax parameter trees:

  * Conv weights: OIHW -> HWIO (grouped convs keep the same transpose).
  * BatchNormalization: (scale, B, mean, var) -> flax BatchNorm
    (scale, bias, mean, var).
  * Gemm/MatMul: transposed to flax Dense (in, out) per the Gemm transB
    attribute (shape-based guessing only when no attribute exists).

Matching is structural: ONNX nodes in topological order are paired with
our parameters in module-instantiation order (natural-sorted flax paths),
with shape checking at every step — a mismatch aborts with both
signatures printed. When the layer COUNTS disagree (e.g. an extra
identity conv in the export), a shape-signature LCS alignment is
attempted as a fallback and the unmatched remainder is reported; use
--dump-manifest to print both full signatures for manual inspection.

Parsing uses the `onnx` package when installed, else falls back to the
dependency-free wire-format reader in tools/onnx_lite.py — so the
conversion runs in environments (like this one) where onnx cannot be
installed.

Usage:
  python tools/import_onnx.py --model yolox --onnx detector.onnx \
      --out weights/<model_stem>
  python tools/import_onnx.py --model yolox --onnx detector.onnx \
      --dump-manifest
"""

from __future__ import annotations

import argparse
import os
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


def execution_order(model, sample):
    """Module paths of Conv/BatchNorm/Dense leaves in CALL order.

    Dict insertion order — which flatten_flax_params relies on — is
    destroyed by ANY pytree round-trip (jax.jit(model.init), orbax
    restore, tree_map all rebuild dicts with sorted keys, and
    'BatchNorm_0' sorts BEFORE 'Conv_0'). Call order is recovered
    structurally instead: a flax method interceptor records each leaf
    module's path while tracing model.init under jax.eval_shape
    (abstract — no FLOPs, no device).
    """
    import jax
    from flax import linen as nn

    order, seen = [], set()

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if isinstance(mod, (nn.Conv, nn.BatchNorm, nn.Dense)) and \
                context.method_name == "__call__":
            p = "/".join(mod.path)
            if p not in seen:
                seen.add(p)
                order.append(p)
        return next_fun(*args, **kwargs)

    def trace(s):
        with nn.intercept_methods(interceptor):
            return model.init(jax.random.PRNGKey(0), s)

    jax.eval_shape(trace, sample)
    return order


def ordered_flax_entries(model, sample, params):
    """flatten_flax_params re-sorted into module EXECUTION order (the
    order a topologically-sorted ONNX export lists its weights in).
    Leaves of modules the interceptor does not see (e.g. GeM's pooling
    exponent) keep their relative order at the end; assign() never
    positions them."""
    entries = flatten_flax_params(params)
    order = execution_order(model, sample)
    idx = {p: i for i, p in enumerate(order)}

    def key(entry):
        parts = entry[0].split("/")
        mod = "/".join(parts[1:-1])  # strip collection prefix + leaf
        return idx.get(mod, len(idx))

    return sorted(entries, key=key)  # stable


def load_onnx_graph(path: str):
    """(nodes, initializers) with a package-agnostic node view.

    nodes: [{op_type, name, input: [...], transB: int|None}]
    initializers: {name: np.ndarray}
    Prefers the `onnx` package; falls back to tools/onnx_lite.py.
    """
    try:
        import onnx
        from onnx import numpy_helper

        model = onnx.load(path)
        init = {i.name: numpy_helper.to_array(i)
                for i in model.graph.initializer}
        nodes = []
        for n in model.graph.node:
            trans_b = None
            for a in n.attribute:
                if a.name == "transB":
                    trans_b = a.i
            nodes.append(dict(op_type=n.op_type, name=n.name,
                              input=list(n.input), output=list(n.output),
                              transB=trans_b))
        return nodes, init
    except ImportError:
        from tools import onnx_lite

        model = onnx_lite.load(path)
        init = {t.name: t.array for t in model.graph.initializer}
        nodes = []
        for n in model.graph.node:
            a = n.attributes.get("transB")
            nodes.append(dict(op_type=n.op_type, name=n.name,
                              input=list(n.input), output=list(n.output),
                              transB=a.i if a is not None else None))
        return nodes, init


def extract_onnx_layers(nodes, init):
    """Yield (kind, arrays) tuples in topological node order.

    kind in {conv, bn, gemm}; arrays are numpy weights for that layer.

    Robust to real-export artifacts: post-processing tails (NMS / Gather
    / Concat / Slice / Mul / Add decode nodes, even when they consume
    constant initializers like anchor grids) contribute no layers, and
    initializers reaching a layer through Identity nodes (some exporters
    wrap constants) are chased to their source.
    """
    # Chase Identity chains: tensor produced by Identity(initializer)
    # is that initializer (repeat for Identity-of-Identity).
    init = dict(init)
    changed = True
    while changed:
        changed = False
        for node in nodes:
            if (node["op_type"] == "Identity" and node["input"]
                    and node["input"][0] in init
                    and node.get("output")
                    and node["output"][0] not in init):
                init[node["output"][0]] = init[node["input"][0]]
                changed = True
    layers = []
    for node in nodes:
        op = node["op_type"]
        inputs = node["input"]
        if op == "Conv":
            w = init.get(inputs[1]) if len(inputs) > 1 else None
            if w is None:
                continue
            b = init.get(inputs[2]) if len(inputs) > 2 else None
            layers.append(("conv", {"kernel": w, "bias": b,
                                    "name": node["name"]}))
        elif op == "BatchNormalization":
            arrs = [init.get(n) for n in inputs[1:5]]
            if any(a is None for a in arrs):
                continue
            scale, bias, mean, var = arrs
            layers.append(("bn", {"scale": scale, "bias": bias,
                                  "mean": mean, "var": var,
                                  "name": node["name"]}))
        elif op in ("Gemm", "MatMul"):
            w = init.get(inputs[1]) if len(inputs) > 1 else None
            if w is None:
                continue
            b = init.get(inputs[2]) if len(inputs) > 2 else None
            # Gemm default transB=0 -> (in, out); the common PyTorch
            # export sets transB=1 -> (out, in). MatMul is (in, out).
            trans = node["transB"] if op == "Gemm" else 0
            layers.append(("gemm", {"kernel": w, "bias": b,
                                    "transB": trans,
                                    "name": node["name"]}))
    return layers


def focus_weight_to_conv6(w_oihw: np.ndarray) -> np.ndarray:
    """Map a Focus-stem 3x3 conv over 4C space-to-depth channels onto
    the equivalent 6x6 stride-2 conv over the raw C channels
    (models/common.py::Focus fold=True).

    w_oihw: (O, 4C, 3, 3), phase channel blocks ordered [tl, bl, tr,
    br] = row/col phases [(0,0), (1,0), (0,1), (1,1)] (the reference
    stem's concat order). Returns flax HWIO (6, 6, C, O): tap (di, dj)
    of phase (pi, pj) reads full-res offset (2(di-1)+pi, 2(dj-1)+pj)
    relative to output pixel (2i, 2j), i.e. kernel index (2*di+pi,
    2*dj+pj) under padding 2.
    """
    o, c4, kh, kw = w_oihw.shape
    if kh != 3 or kw != 3 or c4 % 4:
        raise ValueError(f"not a Focus conv weight: {w_oihw.shape}")
    c = c4 // 4
    out = np.zeros((6, 6, c, o), w_oihw.dtype)
    for p, (pi, pj) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
        for di in range(3):
            for dj in range(3):
                out[2 * di + pi, 2 * dj + pj] = np.transpose(
                    w_oihw[:, p * c:(p + 1) * c, di, dj], (1, 0))
    return out


def _flax_shape_of(kind, path, leaf):
    if kind == "conv":
        # flax HWIO -> the ONNX OIHW signature for comparison.
        h, w, i, o = leaf.shape
        return (o, i, h, w)
    return tuple(leaf.shape)


def _onnx_shape_of(kind, arrs):
    if kind == "bn":
        return tuple(arrs["scale"].shape)
    w = arrs["kernel"]
    if kind == "gemm" and arrs.get("transB"):
        return tuple(np.transpose(w).shape)
    return tuple(w.shape)


def _lcs_align(flax_sigs, onnx_sigs):
    """Longest-common-subsequence alignment over shape signatures.

    Returns [(flax_idx, onnx_idx)] for matched pairs. Used as the
    fallback when layer counts differ (an export with an extra or
    missing layer): order is preserved, equal-shape runs align greedily,
    insertions/deletions are skipped and reported by the caller.
    """
    n, m = len(flax_sigs), len(onnx_sigs)
    lcs = np.zeros((n + 1, m + 1), dtype=np.int32)
    for i in range(n - 1, -1, -1):
        for j in range(m - 1, -1, -1):
            if flax_sigs[i] == onnx_sigs[j]:
                lcs[i, j] = 1 + lcs[i + 1, j + 1]
            else:
                lcs[i, j] = max(lcs[i + 1, j], lcs[i, j + 1])
    pairs = []
    i = j = 0
    while i < n and j < m:
        if flax_sigs[i] == onnx_sigs[j]:
            pairs.append((i, j))
            i += 1
            j += 1
        elif lcs[i + 1, j] >= lcs[i, j + 1]:
            i += 1
        else:
            j += 1
    return pairs


def assign(flax_entries, onnx_layers, strict=True, fused_bn_eps=None):
    """In-order assignment with shape verification.

    Returns ({path: np.ndarray}, [report lines]). With strict=True a
    count mismatch raises; otherwise the LCS fallback aligns what it can
    and reports the remainder. Shape mismatches on aligned pairs always
    raise — a silent misload of same-COUNT-different-shape layers is
    impossible; same-shape swaps are undetectable by construction (run
    an activation-level check after import, see --selfcheck).

    fused_bn_eps: inference exports commonly FOLD BatchNorm into the
    preceding conv (zero BatchNormalization nodes; convs carry biases).
    Our Flax blocks keep explicit BN modules with bias-free convs, so
    such an export would silently drop every conv bias. When the ONNX
    graph has no BN layers but the flax tree expects them, identity BN
    parameters are synthesized — scale=1, mean=0, var=1-eps (so
    sqrt(var+eps) == 1 exactly for the model's BN epsilon), and
    bias=the conv's exported bias — making the composition bit-exact.
    """
    out = {}
    report = []
    flax_map = dict(flax_entries)

    def take(kind_name, flax_list, onnx_list, emit):
        pairs = list(zip(range(len(flax_list)), range(len(onnx_list))))
        if len(flax_list) != len(onnx_list):
            msg = (f"{kind_name} count mismatch: flax {len(flax_list)} vs "
                   f"onnx {len(onnx_list)}")
            if strict:
                raise ValueError(msg + " — architectures differ (re-run "
                                 "with --lenient for LCS alignment, or "
                                 "--dump-manifest to inspect)")
            flax_sigs = [_flax_shape_of(kind_name, p, l)
                         for p, l in flax_list]
            onnx_sigs = [_onnx_shape_of(kind_name, a) for a in onnx_list]
            pairs = _lcs_align(flax_sigs, onnx_sigs)
            matched_f = {i for i, _ in pairs}
            matched_o = {j for _, j in pairs}
            report.append(f"WARNING: {msg}; LCS aligned {len(pairs)}")
            for i, (p, _) in enumerate(flax_list):
                if i not in matched_f:
                    report.append(f"  unmatched flax {kind_name}: {p} "
                                  f"{flax_sigs[i]}")
            for j, a in enumerate(onnx_list):
                if j not in matched_o:
                    report.append(f"  unmatched onnx {kind_name}: "
                                  f"{a.get('name', '?')} {onnx_sigs[j]}")
        for fi, oi in pairs:
            path, leaf = flax_list[fi]
            arrs = onnx_list[oi]
            for sub_path, w in emit(path, arrs):
                ref = flax_map[sub_path]
                if tuple(w.shape) != tuple(ref.shape):
                    raise ValueError(
                        f"{sub_path}: flax {ref.shape} vs onnx {w.shape} "
                        f"(onnx node {arrs.get('name', '?')})")
                out[sub_path] = w

    # Convolutions: OIHW -> HWIO (grouped convs keep the transpose:
    # ONNX (O, I/g, kH, kW) -> flax (kH, kW, I/g, O)). A Focus-stem
    # 3x3-over-4C conv meeting a flax 6x6-over-C kernel is remapped to
    # the folded equivalent (focus_weight_to_conv6).
    conv_kernels = [(p, l) for p, l in flax_entries
                    if p.endswith("kernel") and l.ndim == 4]
    onnx_convs = [a for k, a in onnx_layers if k == "conv"]

    def emit_conv(path, arrs):
        w = arrs["kernel"]
        ref = flax_map[path]
        if (tuple(ref.shape[:2]) == (6, 6) and w.shape[2:] == (3, 3)
                and w.shape[1] == 4 * ref.shape[2]
                and w.shape[0] == ref.shape[3]):
            mapped = focus_weight_to_conv6(w)
        else:
            mapped = np.transpose(w, (2, 3, 1, 0))
        entries = [(path, mapped)]
        bias_path = path.rsplit("/", 1)[0] + "/bias"
        if arrs["bias"] is not None and bias_path in flax_map:
            entries.append((bias_path, arrs["bias"]))
        return entries

    take("conv", conv_kernels, onnx_convs, emit_conv)

    # BatchNormalization: (scale, B, mean, var) -> flax BatchNorm
    # (scale, bias, batch_stats mean/var). Flax stores these as four
    # separate leaves under .../BatchNorm_i/{scale,bias} and
    # batch_stats/.../{mean,var}; match by natural order of scale paths.
    bn_scales = [(p, l) for p, l in flax_entries
                 if "/BatchNorm_" in p and p.endswith("scale")]
    onnx_bns = [a for k, a in onnx_layers if k == "bn"]

    if (fused_bn_eps is not None and len(onnx_bns) < len(bn_scales)
            and len(conv_kernels) == len(onnx_convs)):
        # (Partially) fused Conv+BN export: fewer BN nodes than flax
        # BatchNorms, with folded biases living on the convs. For each
        # flax BN whose nearest PRECEDING conv (flax execution order —
        # our ConvBN-style blocks emit conv-then-BN) carries an exported
        # bias, synthesize identity BN params with that bias (see
        # docstring); the remaining flax BNs (e.g. FastReID's BNNeck,
        # which follows pooling so exporters cannot fold it) consume the
        # graph's real BN nodes in order.
        entry_order = {p: i for i, (p, _) in enumerate(flax_entries)}
        conv_seq = sorted(((entry_order[p], p) for p, _ in conv_kernels))
        onnx_bias_for_conv = {
            p: a.get("bias")
            for (p, _), a in zip(conv_kernels, onnx_convs)}
        rebuilt, n_synth = [], 0
        real_iter = iter(onnx_bns)
        claimed = set()
        for bn_path, bn_leaf in bn_scales:
            bi = entry_order[bn_path]
            prev = [p for i, p in conv_seq if i < bi]
            c = prev[-1] if prev else None
            if c in claimed:
                # The nearest conv already feeds an earlier BN — this BN
                # does not follow a conv (e.g. BNNeck after pooling).
                c = None
            bias = onnx_bias_for_conv.get(c) if c is not None else None
            n = bn_leaf.shape[0]
            if bias is not None and bias.shape == (n,):
                claimed.add(c)
                n_synth += 1
                rebuilt.append({
                    "scale": np.ones(n, np.float32),
                    "bias": np.asarray(bias, np.float32),
                    "mean": np.zeros(n, np.float32),
                    "var": np.full(n, 1.0 - fused_bn_eps, np.float32),
                    "name": f"synth_identity_bn<-{c}",
                })
            else:
                rebuilt.append(next(real_iter, None))
        leftover = sum(1 for _ in real_iter)
        if all(b is not None for b in rebuilt) and leftover == 0:
            onnx_bns = rebuilt
            report.append(
                f"fused Conv+BN export detected: synthesized {n_synth} "
                f"identity BatchNorm layers (eps={fused_bn_eps}) "
                f"carrying the exported conv biases; "
                f"{len(rebuilt) - n_synth} real BN nodes kept")
        else:
            report.append(
                "WARNING: fused-BN reconstruction failed (real BN nodes "
                f"left over: {leftover}); falling back to count-mismatch "
                "handling")

    def emit_bn(path, arrs):
        base = path.rsplit("/", 1)[0]
        stats_base = base.replace("params/", "batch_stats/", 1)
        return [
            (base + "/scale", arrs["scale"]),
            (base + "/bias", arrs["bias"]),
            (stats_base + "/mean", arrs["mean"]),
            (stats_base + "/var", arrs["var"]),
        ]

    take("bn", bn_scales, onnx_bns, emit_bn)

    # Dense / Gemm: flax Dense kernels are (in, out); transpose per the
    # Gemm transB attribute (transB=1 stores (out, in)). MatMul and
    # attribute-free Gemm are (in, out) already; shape-guess only when
    # no attribute was present AND the matrix is non-square.
    dense_kernels = [(p, l) for p, l in flax_entries
                     if ("/Dense_" in p and p.endswith("kernel"))
                     and l.ndim == 2]
    onnx_dense = [a for k, a in onnx_layers if k == "gemm"]

    def emit_dense(path, arrs):
        w = arrs["kernel"]
        if arrs.get("transB"):
            w = np.transpose(w)
        elif arrs.get("transB") is None:
            ref = flax_map[path]
            if tuple(w.shape) != tuple(ref.shape):
                w = np.transpose(w)
        entries = [(path, w)]
        bias_path = path.rsplit("/", 1)[0] + "/bias"
        if arrs.get("bias") is not None and bias_path in flax_map:
            entries.append((bias_path, arrs["bias"]))
        return entries

    take("dense", dense_kernels, onnx_dense, emit_dense)
    return out, report


def dump_manifest(flax_entries, onnx_layers, file=None):
    """Print both signatures side-by-side for manual alignment."""
    file = file if file is not None else sys.stdout
    conv = [(p, _flax_shape_of("conv", p, l)) for p, l in flax_entries
            if p.endswith("kernel") and l.ndim == 4]
    bn = [(p, tuple(l.shape)) for p, l in flax_entries
          if "/BatchNorm_" in p and p.endswith("scale")]
    dense = [(p, tuple(l.shape)) for p, l in flax_entries
             if "/Dense_" in p and p.endswith("kernel") and l.ndim == 2]
    groups = {"conv": conv, "bn": bn, "gemm": dense}
    for kind in ("conv", "bn", "gemm"):
        ours = groups[kind]
        theirs = [(a.get("name", "?"), _onnx_shape_of(kind, a))
                  for k, a in onnx_layers if k == kind]
        print(f"== {kind}: flax {len(ours)} vs onnx {len(theirs)}",
              file=file)
        for i in range(max(len(ours), len(theirs))):
            left = f"{ours[i][0]} {ours[i][1]}" if i < len(ours) else "-"
            right = (f"{theirs[i][0]} {theirs[i][1]}"
                     if i < len(theirs) else "-")
            mark = " " if (i < len(ours) and i < len(theirs)
                           and ours[i][1] == theirs[i][1]) else "!"
            print(f"{mark} [{i:3d}] {left:<60s} | {right}", file=file)


# BatchNorm epsilon per model family (must match the flax modules so the
# fused-BN identity synthesis is bit-exact: models/common.py::ConvBN uses
# 1e-3, models/fastreid.py and models/facereid.py use 1e-5).
BN_EPS = {"yolox": 1e-3, "fastreid": 1e-5, "facereid": 1e-5}


def build_model(name: str, mini: bool = False,
                input_hw: "tuple[int, int] | None" = None):
    """input_hw: trace-sample spatial dims. Conversion only needs ONE
    forward trace to recover execution order, and conv/BN params are
    spatial-independent — a smaller sample (any multiple of the
    architecture's total stride) produces the identical param tree and
    layer order at a fraction of the XLA:CPU compile cost. None = the
    model's canonical deployment input."""
    import jax.numpy as jnp

    from botsort_tpu.models import FaceReID, FastReIDSBS, YOLOX
    from botsort_tpu.runtime.assets import MINI

    if mini:
        model = {"yolox": YOLOX(**MINI["detector"]),
                 "fastreid": FastReIDSBS(**MINI["body"]),
                 "facereid": FaceReID(**MINI["face"])}[name]
        hw = input_hw or {"yolox": (96, 128), "fastreid": (64, 32),
                          "facereid": (32, 32)}[name]
        return model, jnp.zeros((1,) + tuple(hw) + (3,))
    model = {"yolox": YOLOX(num_classes=4, depth=1.33, width=1.25),
             "fastreid": FastReIDSBS(),
             "facereid": FaceReID()}[name]
    hw = input_hw or {"yolox": (480, 640), "fastreid": (256, 128),
                      "facereid": (128, 128)}[name]
    return model, jnp.zeros((1,) + tuple(hw) + (3,))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", choices=["yolox", "fastreid", "facereid"],
                        required=True)
    parser.add_argument("--onnx", required=True)
    parser.add_argument("--out")
    parser.add_argument("--dump-manifest", action="store_true",
                        help="print both layer signatures and exit")
    parser.add_argument("--lenient", action="store_true",
                        help="on layer-count mismatch, LCS-align by shape "
                             "signature instead of aborting")
    parser.add_argument("--mini", action="store_true",
                        help="miniature architectures (CI smoke tests)")
    parser.add_argument("--input-hw", type=int, nargs=2, default=None,
                        metavar=("H", "W"),
                        help="trace-sample spatial dims (conversion is "
                             "spatial-independent; smaller = faster on "
                             "CPU-only hosts)")
    parser.add_argument("--selfcheck", action="store_true",
                        help="after import, run the flax model on a fixed "
                             "input and print output statistics (compare "
                             "against an onnxruntime run of the source "
                             "model where available)")
    args = parser.parse_args(argv)

    if not os.path.isfile(args.onnx):
        print(f"ERROR: ONNX file not found: {args.onnx}", file=sys.stderr)
        return 2

    import jax

    from botsort_tpu.runtime.assets import save_checkpoint

    model, sample = build_model(args.model, mini=args.mini,
                                input_hw=args.input_hw)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample)

    nodes, init = load_onnx_graph(args.onnx)
    layers = extract_onnx_layers(nodes, init)
    # jit(init) returns a key-sorted tree; recover execution order
    # structurally (see execution_order).
    flax_entries = ordered_flax_entries(model, sample, params)

    if args.dump_manifest:
        dump_manifest(flax_entries, layers)
        return 0
    if not args.out:
        print("ERROR: --out is required unless --dump-manifest",
              file=sys.stderr)
        return 2

    assignments, report = assign(flax_entries, layers,
                                 strict=not args.lenient,
                                 fused_bn_eps=BN_EPS[args.model])
    for line in report:
        print(line, file=sys.stderr)

    import jax.numpy as jnp

    flat = dict(flax_entries)
    for path, value in assignments.items():
        flat[path] = jnp.asarray(value)
    # Rebuild the tree.
    from flax.traverse_util import unflatten_dict

    rebuilt = unflatten_dict({tuple(k.split("/")): v
                              for k, v in flat.items()})
    save_checkpoint(args.out, rebuilt)
    print(f"wrote {args.out} ({len(assignments)} tensors converted)")

    if args.selfcheck:
        out = jax.jit(model.apply)(rebuilt, sample)
        flatout = jax.tree.leaves(out)
        for i, o in enumerate(flatout):
            o = np.asarray(o, dtype=np.float64)
            print(f"selfcheck output[{i}]: shape {o.shape} "
                  f"mean {o.mean():.6f} std {o.std():.6f} "
                  f"absmax {np.abs(o).max():.6f}")
        print("selfcheck: compare these against the ONNX model run with "
              "onnxruntime on a zeros input to catch same-shape swaps.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
