"""Post-training int8 quantization for the conv backbones.

The reference's speed story is TensorRT fp16 engines (README.md:101-104);
our bf16 path is the TPU analog. This module goes one step further: v5e's
MXU runs s8 x s8 -> s32 convolutions at roughly twice the bf16 rate
(measured ~1.6x end-to-end on chained 3x3/640ch convs net of dispatch),
so the two big CNNs — YOLOX-X and the ResNeSt-50 body encoder, ~95% of
the frame's FLOPs — can serve quantized.

Design: NO model rewrites. Quantization is an execution-time transform
via ``flax.linen.intercept_methods``:

- ``calibrate`` runs the unmodified model over representative inputs and
  records, per ``nn.Conv`` instance (keyed by its module path), the
  maximum absolute activation entering the conv (sowed through flax's
  ``intermediates`` collection, so it works under jit).
- ``quantize_params`` rewrites every intercepted conv kernel in the
  param tree to int8 with per-output-channel symmetric scales
  (round(k / s_c), s_c = amax_c / 127).
- ``QuantizedModule`` duck-types ``module.apply``: it intercepts each
  ``nn.Conv.__call__`` and replaces it with
      x8 = clip(round(x / s_act)) ->
      lax.conv_general_dilated(x8, k8, ..., preferred_element_type=s32)
      -> y * (s_act * s_w[c])
  Everything around the convs (BatchNorm folding inputs, SiLU/ReLU,
  pooling, the decode / GeM / BNNeck tails) stays in bf16/f32 exactly as
  before, which keeps the numerics local: per-channel weight scales +
  per-tensor activation scales are the standard recipe that holds CNN
  accuracy within ~1% (validated here against the bf16 path in
  tests/test_quantize.py; MOTA/IDF1 revalidation once real weights
  exist is noted in PARITY.md).

``QuantizedModule`` is hashable by content digest so it can ride in
``ModelBundle``'s static aux and the fused ``frame_step`` jit-caches on
it like on a plain flax module — the pipeline code does not change.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_AMAX_SOW = "quant_amax"


def _path_str(path: Tuple[str, ...]) -> str:
    return "/".join(path)


def _conv_dims(mod: nn.Conv, x: jnp.ndarray):
    """Normalize an nn.Conv's geometry to lax.conv_general_dilated args."""
    k = len(mod.kernel_size)
    if k != 2 or x.ndim != 4:
        return None  # only 2-D convs on NHWC batches are quantized
    def pair(v, default=1):
        if v is None:
            v = default
        if isinstance(v, int):
            return (v, v)
        return tuple(v)
    strides = pair(mod.strides)
    padding = mod.padding
    if isinstance(padding, str):
        pad = padding
    elif isinstance(padding, int):
        pad = ((padding, padding),) * 2
    else:
        pad = tuple(
            (p, p) if isinstance(p, int) else tuple(p) for p in padding)
    return dict(
        window_strides=strides,
        padding=pad,
        rhs_dilation=pair(mod.kernel_dilation),
        lhs_dilation=pair(mod.input_dilation),
        feature_group_count=mod.feature_group_count,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _calib_interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if isinstance(mod, nn.Conv) and args and hasattr(args[0], "ndim"):
        if _conv_dims(mod, args[0]) is not None:
            amax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
            mod.sow("intermediates", _AMAX_SOW, amax)
    return next_fun(*args, **kwargs)


def calibrate(module: nn.Module, params, batches: Iterable[Any],
              apply_fn=None) -> Dict[str, float]:
    """Max-abs activation entering each quantizable conv, over batches.

    batches: iterable of module inputs (each one positional arg).
    Returns {conv_module_path: amax} with concrete floats.
    """
    amax: Dict[str, float] = {}

    @jax.jit
    def run(p, x):
        with nn.intercept_methods(_calib_interceptor):
            _, inter = module.apply(p, x, mutable=["intermediates"])
        return inter["intermediates"]

    for x in batches:
        inter = jax.device_get(run(params, x))
        flat = jax.tree_util.tree_flatten_with_path(inter)[0]
        for path, leaf in flat:
            keys = [str(getattr(p, "key", p)) for p in path]
            # .../<conv scope path...>/quant_amax/<tuple idx>
            if _AMAX_SOW in keys:
                cut = keys.index(_AMAX_SOW)
                amax_key = _path_str(tuple(keys[:cut]))
                amax[amax_key] = max(amax.get(amax_key, 0.0), float(leaf))
    return amax


def quantize_params(module: nn.Module, params, act_amax: Dict[str, float]):
    """Rewrite calibrated conv kernels to int8 (per-out-channel scales).

    Returns (qparams, w_scales {path: np.ndarray[Cout] f32}).
    """
    w_scales: Dict[str, np.ndarray] = {}
    tree = params["params"] if "params" in params else params

    def visit(subtree, prefix):
        for name, child in list(subtree.items()):
            if isinstance(child, dict):
                visit(child, prefix + (name,))
            elif name == "kernel" and _path_str(prefix) in act_amax:
                k = np.asarray(jax.device_get(child), np.float32)
                if k.ndim != 4:
                    continue
                s = np.max(np.abs(k), axis=(0, 1, 2)) / 127.0
                s = np.where(s > 0, s, 1.0).astype(np.float32)
                k8 = np.clip(np.rint(k / s), -127, 127).astype(np.int8)
                subtree[name] = jnp.asarray(k8)
                w_scales[_path_str(prefix)] = s

    # Work on a mutable copy of the (frozen or plain) dict tree.
    def to_mutable(t):
        return {k: to_mutable(v) if isinstance(v, dict) else v
                for k, v in t.items()}

    mut = to_mutable(dict(tree))
    visit(mut, ())
    out = dict(params)
    if "params" in params:
        out["params"] = mut
        return out, w_scales
    return mut, w_scales


class QuantizedModule:
    """Duck-types a flax module's ``.apply`` with int8 conv execution.

    Hashable by content (module + scale digests) so it can sit in
    ``ModelBundle``'s static jit aux exactly like a plain flax module.
    """

    def __init__(self, module: nn.Module, act_amax: Dict[str, float],
                 w_scales: Dict[str, np.ndarray]):
        self.module = module
        self.act_scale = {
            p: np.float32(max(v, 1e-12) / 127.0)
            for p, v in act_amax.items() if p in w_scales
        }
        self.w_scales = {p: np.asarray(s, np.float32)
                         for p, s in w_scales.items()}
        h = hashlib.sha256()
        h.update(repr(module).encode())
        for p in sorted(self.act_scale):
            h.update(p.encode())
            h.update(np.float32(self.act_scale[p]).tobytes())
            h.update(self.w_scales[p].tobytes())
        self._digest = h.hexdigest()

    # --- static-aux hashing contract -------------------------------
    def __hash__(self):
        return hash(self._digest)

    def __eq__(self, other):
        return (isinstance(other, QuantizedModule)
                and self._digest == other._digest)

    def __getattr__(self, name):
        # Geometry helpers etc. (e.g. .feature_dim) fall through to the
        # wrapped module definition.
        return getattr(self.module, name)

    # ----------------------------------------------------------------
    def _interceptor(self, next_fun, args, kwargs, context):
        mod = context.module
        if not isinstance(mod, nn.Conv):
            return next_fun(*args, **kwargs)
        path = _path_str(mod.path)
        sx = self.act_scale.get(path)
        if sx is None:
            return next_fun(*args, **kwargs)
        # Same defensive guard as _calib_interceptor: flax can invoke
        # intercepted conv methods without a positional array argument.
        if not args or not hasattr(args[0], "ndim"):
            return next_fun(*args, **kwargs)
        x = args[0]
        dims = _conv_dims(mod, x)
        kernel = mod.variables["params"]["kernel"]
        if dims is None or kernel.dtype != jnp.int8:
            return next_fun(*args, **kwargs)
        x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            x8, kernel, preferred_element_type=jnp.int32, **dims)
        sw = jnp.asarray(self.w_scales[path] * sx)
        y = y.astype(jnp.float32) * sw
        if mod.use_bias:
            y = y + mod.variables["params"]["bias"].astype(jnp.float32)
        dt = mod.dtype if mod.dtype is not None else jnp.float32
        return y.astype(dt)

    def apply(self, params, *args, **kwargs):
        with nn.intercept_methods(self._interceptor):
            return self.module.apply(params, *args, **kwargs)


def quantize_module(module: nn.Module, params, batches: Iterable[Any],
                    path_filter=None) -> Tuple[QuantizedModule, Any]:
    """One-call flow: calibrate -> quantize kernels -> wrap.

    Returns (QuantizedModule, qparams) usable exactly like
    (module, params).

    path_filter: optional predicate over conv module paths — convs it
    rejects stay bf16. Lets int8 be SCOPED to regions where the MXU
    gain beats the per-layer requantization cost (e.g. mid-network
    stages only; docs/PERF.md measures full-model int8 net-negative on
    v5e/XLA today).
    """
    amax = calibrate(module, params, batches)
    if path_filter is not None:
        amax = {p: v for p, v in amax.items() if path_filter(p)}
    qparams, w_scales = quantize_params(module, params, amax)
    return QuantizedModule(module, amax, w_scales), qparams


def _mid_scope_body(path: str) -> bool:
    """Body-encoder int8 scope that WINS on v5e: bottleneck stages 2-4
    only (SplAtBottleneck index >= 3). Measured b64 256x128: bf16
    6.85 ms, int8 FULL 7.84 ms (requant/layout churn on the small
    stem/stage-1 layers), int8 MID 6.15 ms (tools/perf_probe.py
    --stages int8scope)."""
    import re

    m = re.search(r"SplAtBottleneck_(\d+)", path)
    return m is not None and int(m.group(1)) >= 3


def _mid_scope_detector(path: str) -> bool:
    """Detector int8 scope: big mid-network convs only — skip the
    stem, dark2 (small-channel, layout-sensitive) and the decoupled
    heads (feed f32 decode)."""
    if "Focus_0" in path or "DecoupledHead_0" in path:
        return False
    if "CSPDarknet_0/ConvBN_0/" in path or "CSPDarknet_0/CSPLayer_0/" \
            in path:
        return False
    return True


def quantize_bundle(bundle, frames: Optional[Any] = None,
                    which: Tuple[str, ...] = ("body",),
                    pipe_cfg=None, num_calib: int = 4,
                    scope: str = "mid"):
    """Quantize the heavy CNNs of a ModelBundle for int8 serving.

    frames: [K, H, W, 3] uint8 source frames used for calibration
    (random frames if None). The detector calibrates on resized frames,
    the body encoder on preprocessed random crops — the same input
    distributions the pipeline feeds them. The face encoder stays bf16
    (depthwise MobileNet: VPU-bound, int8 conv gains nothing).

    scope: "mid" (default) quantizes only the mid-network convs where
    the MXU gain beats per-layer requantization — measured NET POSITIVE
    on v5e for the body encoder (docs/PERF.md); "full" quantizes every
    calibrated conv (measured net negative on v5e; useful on backends
    that fuse requantization).

    which: defaults to the BODY ENCODER ONLY — the detector measured a
    LOSS in every int8 configuration on v5e/XLA (full b1 3.87->4.68 ms;
    scoped-mid b8 15.2->18.1 ms, tools/perf_probe.py --stages
    int8scopedet): post-Focus-fold it already runs at 47-56% MFU, so
    requant overhead has no small-channel slack to reclaim. Pass
    which=("detector", "body") to quantize it anyway on backends that
    fuse requantization.
    """
    from botsort_tpu.config import PipelineConfig
    from botsort_tpu.models import fastreid as fastreid_mod
    from botsort_tpu.pipeline.frame_step import ModelBundle

    pipe_cfg = pipe_cfg or PipelineConfig()
    rng = np.random.default_rng(0)
    if frames is None:
        frames = rng.integers(0, 255, (num_calib, 720, 1280, 3),
                              dtype=np.uint8)
    frames = np.asarray(frames)[:num_calib]

    detector, det_params = bundle.detector, bundle.detector_params
    body, body_params = bundle.body_encoder, bundle.body_params

    det_filter = _mid_scope_detector if scope == "mid" else None
    body_filter = _mid_scope_body if scope == "mid" else None

    if "detector" in which:
        in_h, in_w = pipe_cfg.detector_input_hw
        det_batches = [
            jax.image.resize(jnp.asarray(f, jnp.float32),
                             (in_h, in_w, 3), method="linear")[None]
            for f in frames
        ]
        detector, det_params = quantize_module(
            bundle.detector, bundle.detector_params, det_batches,
            path_filter=det_filter)
    if "body" in which:
        # int8 quantization intercepts flax nn.Conv calls; the dgfa
        # dense-groups lowering bypasses nn.Conv (direct lax conv), so
        # a dgfa stage inside the int8 scope would silently stay bf16.
        # Scope "mid" quantizes bottlenecks >= 3 (stage index >= 1):
        # keep dgfa only on stage 0 there — stage 1 reverts to the
        # grouped lowering and quantizes, as measured in PERF.md.
        if scope == "mid" and getattr(body, "dgfa_stages", ()):
            body = body.clone(dgfa_stages=tuple(
                s for s in body.dgfa_stages if s == 0))
        bh, bw = pipe_cfg.body_reid_input_hw
        crops = []
        for f in frames:
            h, w = f.shape[:2]
            ys = rng.integers(0, max(h - bh, 1), 4)
            xs = rng.integers(0, max(w - bw, 1), 4)
            crops.append(np.stack([
                np.asarray(
                    jax.image.resize(
                        jnp.asarray(
                            f[y:y + max(bh, h // 3),
                              x:x + max(bw, w // 4)], jnp.float32),
                        (bh, bw, 3), method="linear"))
                for y, x in zip(ys, xs)]))
        body_batches = [fastreid_mod.preprocess(jnp.asarray(c))
                        for c in crops]
        body, body_params = quantize_module(
            body, bundle.body_params, body_batches,
            path_filter=body_filter)

    return ModelBundle(
        detector=detector, detector_params=det_params,
        body_encoder=body, body_params=body_params,
        face_encoder=bundle.face_encoder,
        face_params=bundle.face_params,
    )
