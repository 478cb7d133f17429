"""Model asset management: presets, checkpoints, and bundle construction.

The reference downloads ONNX files (plus prebuilt sm86 TensorRT engines
for RTX-30xx GPUs) from its GitHub releases at startup
(demo_bottrack_onnx_tflite.py:1815-1838, 1997-2047, ONNX_TRTENGINE_SETS
demo:33-51). Here model weights live in orbax checkpoints; the registry
below maps the reference's model file names onto our architectures so the
CLI accepts the same ``-odm/-bfem/-ffem`` names. When no checkpoint is
present the models run with random initialization (functional pipeline,
no pretrained accuracy) and a clear warning — this repo has no network
egress; tools/import_onnx.py converts the reference's ONNX weights when
available.
"""

from __future__ import annotations

import os
import re
import sys
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from botsort_tpu.models import FaceReID, FastReIDSBS, YOLOX
from botsort_tpu.pipeline.frame_step import ModelBundle
from botsort_tpu.utils.colors import yellow

# Reference model names (demo:1902-1935) -> architecture hints.
# Detector names embed NxCxHxW, e.g. "..._post_1x3x480x640_score015...".
DETECTOR_NAME_RE = re.compile(r"x(?P<h>\d+)x(?P<w>\d+)(?:_|\.)")
REID_NAME_RE = re.compile(
    r"(?P<train>mot\d+)_sbs_S50_NMx3x(?P<h>\d+)x(?P<w>\d+)")

DEFAULT_DETECTOR = (
    "yolox_x_body_head_hand_face_0076_0.5228_post_1x3x480x640_"
    "score015_iou080_box050.onnx")
DEFAULT_BODY_REID = "mot17_sbs_S50_NMx3x256x128_post_feature_only.onnx"
DEFAULT_FACE_REID = (
    "face-reidentification-retail-0095_NMx3x128x128_post_feature_only.onnx")

# Startup asset fetch (the reference auto-downloads its ONNX files from
# GitHub releases before constructing models, demo:1997-2047). Converted
# orbax checkpoints are distributed as {stem}.tar under a base URL set
# via this env var; unset = skip fetching (offline environments).
WEIGHTS_URL_ENV = "BOTSORT_TPU_WEIGHTS_URL"


def ensure_checkpoints(model_names, weights_dir: str) -> None:
    """Fetch any missing checkpoint dirs from $BOTSORT_TPU_WEIGHTS_URL.

    Idempotent: present checkpoints are never re-fetched; without the
    env var this is a no-op (build_bundle then warns about random init).
    """
    base = os.environ.get(WEIGHTS_URL_ENV)
    if not base:
        return
    from botsort_tpu.runtime.download import fetch_checkpoint

    for name in model_names:
        stem = os.path.splitext(os.path.basename(name))[0]
        if os.path.isdir(os.path.join(weights_dir, stem)):
            continue
        fetch_checkpoint(f"{base.rstrip('/')}/{stem}.tar", weights_dir,
                         stem)

# Miniature architectures for tests / CI (CPU per-op compile is slow).
MINI = {
    "detector": dict(num_classes=4, depth=0.33, width=0.25),
    "body": dict(stage_blocks=(1, 1, 1, 1), stage_widths=(8, 16, 32, 64),
                 stem_width=8),
    "face": dict(layout=((1, 8, 1, 1), (6, 16, 1, 2), (6, 32, 1, 2)),
                 head_width=64),
}


def parse_detector_input_hw(name: str) -> Tuple[int, int]:
    m = DETECTOR_NAME_RE.search(name)
    return (int(m.group("h")), int(m.group("w"))) if m else (480, 640)


def parse_body_reid_input_hw(name: str) -> Tuple[int, int]:
    m = REID_NAME_RE.search(name)
    return (int(m.group("h")), int(m.group("w"))) if m else (256, 128)


def _load_checkpoint(path: str) -> Optional[Any]:
    if not path or not os.path.isdir(path):
        return None
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def cast_bundle_bf16(bundle: ModelBundle) -> ModelBundle:
    """Pre-cast conv/dense kernels (ndim >= 2) to bfloat16.

    Flax modules run with dtype=bfloat16 and cast f32 params at every
    use — inside a per-frame scan that is ~130M f32 reads + converts per
    step (~0.5 GB/frame of HBM traffic for YOLOX-X alone). Casting once
    up front halves the weight traffic and deletes the converts. 1-D
    leaves (BatchNorm stats/scales, biases) stay f32: they are tiny and
    var+eps precision matters.
    """
    def cast(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and \
                jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(jnp.bfloat16)
        return x

    return ModelBundle(
        detector=bundle.detector,
        detector_params=jax.tree.map(cast, bundle.detector_params),
        body_encoder=bundle.body_encoder,
        body_params=jax.tree.map(cast, bundle.body_params),
        face_encoder=bundle.face_encoder,
        face_params=jax.tree.map(cast, bundle.face_params),
    )


def save_checkpoint(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def build_bundle(
    detector_name: str = DEFAULT_DETECTOR,
    body_reid_name: str = DEFAULT_BODY_REID,
    face_reid_name: str = DEFAULT_FACE_REID,
    weights_dir: str = "weights",
    mini: bool = False,
    seed: int = 0,
    dtype: Any = jnp.bfloat16,
    fake_params: bool = False,
    cast_bf16: Optional[bool] = None,
    dgfa: Optional[bool] = None,
) -> ModelBundle:
    """Construct the three models, restoring checkpoints when present.

    Checkpoint layout: {weights_dir}/{model_file_stem}/ (orbax).

    cast_bf16: pre-cast conv/dense kernels to bfloat16 (see
    cast_bundle_bf16); None = auto (on when the backend is TPU and the
    models run bf16 anyway — numerically identical to flax's per-use
    cast, halves per-step weight traffic).

    dgfa: TPU relowering gate (exact math, same param trees; None =
    auto: on only when the backend is TPU). Gates (a) the body ReID's
    first two stages' split-attention blocks as block-diagonal dense
    convs + lane-sliced attention (models/fastreid.py; measured -18%
    full-encoder time at b64 on v5e, docs/PERF.md "SplAt lowering")
    and (b) the detector's dark2 CSP output stage as a concat-free
    split-sum (models/common.py::_SplitSumOut; measured 2x on that
    segment). Off on CPU: dense-grouped convs double nominal FLOPs
    (pure loss off-MXU) and have triggered XLA:CPU LLVM JIT segfaults
    in long-lived many-program processes (e.g. the full pytest suite),
    and weight IMPORT relies on every kernel being created by an
    nn.Conv call (tools/import_onnx.py execution-order interceptor).
    """
    if not mini:
        ensure_checkpoints(
            (detector_name, body_reid_name, face_reid_name), weights_dir)
    det_kw = MINI["detector"] if mini else dict(num_classes=4, depth=1.33,
                                                width=1.25)
    body_kw = MINI["body"] if mini else {}
    face_kw = MINI["face"] if mini else {}
    if dgfa is None:
        dgfa = jax.default_backend() == "tpu"
    # splitsum rides the same gate: concat-free CSP output stage on
    # dark2 (same params/math; 2x on its low-MFU geometry on v5e —
    # docs/PERF.md "dark2"). Off on CPU, where imports/tests run, so
    # the importer's execution-order interceptor always sees nn.Conv.
    detector = YOLOX(dtype=dtype,
                     splitsum_csp=(0,) if dgfa else (), **det_kw)
    body = FastReIDSBS(dtype=dtype,
                       dgfa_stages=(0, 1) if dgfa else (), **body_kw)
    face = FaceReID(dtype=dtype, **face_kw)

    rng = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    det_h, det_w = parse_detector_input_hw(detector_name)
    body_h, body_w = parse_body_reid_input_hw(body_reid_name)
    if mini:
        det_h, det_w, body_h, body_w = 96, 128, 64, 32

    def init_or_load(model, key, sample, name):
        stem = os.path.splitext(os.path.basename(name))[0]
        path = os.path.join(weights_dir, stem)
        restored = None
        try:
            restored = _load_checkpoint(path)
        except Exception as e:  # pragma: no cover - corrupt ckpt
            print(yellow(f"WARNING: failed to restore {path}: {e}"),
                  file=sys.stderr)
        if restored is not None:
            return restored
        # stderr: callers like bench.py contract to emit exactly one
        # JSON line on stdout.
        print(yellow(
            f"WARNING: no checkpoint at {path}; using random init "
            f"(run tools/import_onnx.py to convert reference weights)"),
            file=sys.stderr)
        if fake_params:
            # Benchmarks: structurally correct RANDOM params without
            # running the eager init graph. FLOP cost matches trained
            # weights exactly; unlike all-zero params the data reaching
            # NMS's fixpoint loop, top-k, and the JV augmentation loops
            # is non-degenerate, so data-dependent iteration counts are
            # realistic. Norm-layer stats get their fixed points
            # (scale/var=1, bias/mean=0) so activations stay finite.
            shapes = jax.eval_shape(model.init, key, sample)
            paths = [
                "/".join(str(getattr(p, "key", p)) for p in path)
                for path, _ in jax.tree_util.tree_flatten_with_path(
                    shapes)[0]]
            leaves, treedef = jax.tree.flatten(shapes)

            @jax.jit
            def make(key):
                keys = jax.random.split(key, len(leaves))
                out = []
                for pk, k, s in zip(paths, keys, leaves):
                    low = pk.lower()
                    if not jnp.issubdtype(s.dtype, jnp.floating):
                        out.append(jnp.zeros(s.shape, s.dtype))
                    elif "scale" in low or "var" in low:
                        out.append(jnp.ones(s.shape, s.dtype))
                    elif "bias" in low or "mean" in low:
                        out.append(jnp.zeros(s.shape, s.dtype))
                    else:
                        fan_in = max(int(np.prod(s.shape[:-1])), 1)
                        out.append(
                            jax.random.normal(k, s.shape, s.dtype)
                            * (1.0 / fan_in) ** 0.5)
                return out

            return jax.tree.unflatten(treedef, make(key))
        # jit(init): one compiled program instead of hundreds of eager
        # per-op dispatches (slow over this env's device tunnel).
        return jax.jit(model.init)(key, sample)

    det_params = init_or_load(
        detector, k1, jnp.zeros((1, det_h, det_w, 3)), detector_name)
    body_params = init_or_load(
        body, k2, jnp.zeros((1, body_h, body_w, 3)), body_reid_name)
    face_params = init_or_load(
        face, k3, jnp.zeros((1, 128 if not mini else 32,
                             128 if not mini else 32, 3)), face_reid_name)
    bundle = ModelBundle(
        detector=detector, detector_params=det_params,
        body_encoder=body, body_params=body_params,
        face_encoder=face, face_params=face_params,
    )
    if cast_bf16 is None:
        cast_bf16 = (dtype == jnp.bfloat16
                     and jax.default_backend() == "tpu")
    if cast_bf16:
        bundle = cast_bundle_bf16(bundle)
    return bundle
