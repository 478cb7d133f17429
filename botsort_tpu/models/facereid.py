"""Face ReID encoder in Flax (face-reidentification-retail-0095 class).

Native implementation of the model family behind the reference's face
ReID ONNX ``face-reidentification-retail-0095_NMx3x128x128_post_feature_
only`` (consumed at demo_bottrack_onnx_tflite.py:1144-1250): a compact
MobileNetV2-style backbone on 128x128 face crops producing a 256-d
embedding, with the same fused L2-normalize + N x M cosine-similarity
post-process as the body encoder.

Input convention matches the reference preprocess (demo:1234-1250): raw
BGR pixels 0..255, no normalization, no channel swap.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class _DWConvShift(nn.Module):
    """Depthwise 3x3 conv computed as 9 weighted strided-slice FMAs.

    Mathematically identical to ``nn.Conv(features, (3, 3),
    feature_group_count=features)`` with SAME padding, and consumes the
    IDENTICAL param tree ({'kernel': (3, 3, 1, C)}) so checkpoints and
    the ONNX importer are oblivious to which lowering runs. Tried
    because XLA's grouped-conv lowering is the face encoder's VPU
    bottleneck (docs/PERF.md): as 9 shifted multiply-adds the op is
    plain fusable elementwise work with channels contiguous on lanes.
    MEASURED A LOSS on v5e at every production batch (tools/perf_probe
    --stages facevar, 2026-08-19: b16 0.261 vs 0.222 ms, b128 1.246 vs
    0.841 — the 9 materialized shifted operands cost more HBM traffic
    than the grouped conv's im2col); stays in-tree as a parity-tested
    opt-in for future XLA versions, NOT wired into any default path.
    """

    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 1, self.features), jnp.float32).astype(self.dtype)
        x = x.astype(self.dtype)
        n, h, w, c = x.shape
        s = self.stride
        # Flax SAME padding for k=3: pad 1 each side; out = ceil(dim/s).
        ho = -(-h // s)
        wo = -(-w // s)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = jnp.zeros((n, ho, wo, c), self.dtype)
        for dy in range(3):
            for dx in range(3):
                sl = jax.lax.slice(
                    xp,
                    (0, dy, dx, 0),
                    (n, dy + (ho - 1) * s + 1, dx + (wo - 1) * s + 1, c),
                    (1, s, s, 1))
                out = out + sl * kernel[dy, dx, 0]
        return out


class _ConvBNRelu6(nn.Module):
    """dw_mode selects HOW a depthwise 3x3 executes (same math, same
    param tree for every mode): 'conv' = XLA grouped conv (default),
    'shift' = 9 shifted FMAs (_DWConvShift; measured loss, kept for
    A/B), 'pallas' = fused VMEM stencil kernel (facereid_pallas),
    'skip' = ELIDE the op (identity / stride-slice) — WRONG numerics,
    probe-only: times the model's non-depthwise remainder to upper-
    bound any dw optimization (tools/perf_probe.py --stages facedw).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.bfloat16
    dw_mode: str = "conv"

    _DW_MODES = ("conv", "shift", "pallas", "skip")

    @nn.compact
    def __call__(self, x):
        if self.dw_mode not in self._DW_MODES:
            raise ValueError(
                f"unknown dw_mode {self.dw_mode!r}; "
                f"expected one of {self._DW_MODES}")
        if self.dw_mode != "conv" and self.groups > 1:
            assert self.groups == self.features == x.shape[-1] \
                and self.kernel == 3, "dw lowerings are dw-3x3 only"
            if self.dw_mode == "skip":
                # No param registered; flax.apply ignores the extra
                # 'Conv_0' entry in a default-built param tree.
                x = x[:, ::self.stride, ::self.stride, :].astype(self.dtype)
            elif self.dw_mode == "pallas":
                from botsort_tpu.models import facereid_pallas
                x = facereid_pallas.DWConvPallas(
                    self.features, self.stride,
                    dtype=self.dtype, name="Conv_0")(x)
            else:  # "shift" — the only mode left after validation
                # name='Conv_0' keeps the param path identical to the
                # nn.Conv branch below.
                x = _DWConvShift(self.features, self.stride,
                                 dtype=self.dtype, name="Conv_0")(x)
        else:
            p = (self.kernel - 1) // 2
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((p, p), (p, p)),
                        feature_group_count=self.groups, use_bias=False,
                        dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype)(x)
        return jnp.minimum(nn.relu(x), 6.0) if self.act else x


class InvertedResidual(nn.Module):
    features: int
    stride: int = 1
    expand: int = 6
    dtype: Any = jnp.bfloat16
    dw_mode: str = "conv"

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = _ConvBNRelu6(hidden, 1, 1, dtype=self.dtype)(y)
        y = _ConvBNRelu6(hidden, 3, self.stride, groups=hidden,
                         dtype=self.dtype, dw_mode=self.dw_mode)(y)
        y = _ConvBNRelu6(self.features, 1, 1, act=False, dtype=self.dtype)(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


# (expand, channels, repeats, stride) — MobileNetV2 layout.
MOBILENETV2_LAYOUT = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                      (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                      (6, 320, 1, 1))


class FaceReID(nn.Module):
    """MobileNetV2 trunk -> global pool -> 256-d embedding.

    `layout`/`head_width` are exposed so tests can run a miniature trunk.
    """

    feature_dim: int = 256
    layout: tuple = MOBILENETV2_LAYOUT
    head_width: int = 1280
    dtype: Any = jnp.bfloat16
    # How to lower the depthwise 3x3s — see _ConvBNRelu6.dw_mode.
    dw_mode: str = "conv"

    @nn.compact
    def __call__(self, images):
        """images: [N, 128, 128, 3] raw BGR 0..255. Returns [N, 256]
        float32 L2-normalized embeddings."""
        x = images.astype(self.dtype)
        x = _ConvBNRelu6(32, 3, 2, dtype=self.dtype)(x)
        for expand, ch, reps, stride in self.layout:
            for i in range(reps):
                x = InvertedResidual(ch, stride if i == 0 else 1, expand,
                                     dtype=self.dtype,
                                     dw_mode=self.dw_mode)(x)
        x = _ConvBNRelu6(self.head_width, 1, 1, dtype=self.dtype)(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        feat = nn.Dense(self.feature_dim, dtype=jnp.float32)(x)
        norm = jnp.linalg.norm(feat, axis=-1, keepdims=True)
        return feat / jnp.maximum(norm, 1e-12)


def encode_and_compare(
    model: FaceReID,
    params,
    images: jnp.ndarray,
    target_features: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(base_images [N,H,W,3], target_features [M,D]) ->
    (base_features [N,D], similarities [N,M]).

    NOTE output order: the reference's face ONNX emits (features,
    similarities) — the opposite of the body model — and the caller
    un-swaps them (demo:1170, 1478-1480). We keep the face model's native
    order so the importer maps 1:1; the pipeline handles orientation.
    """
    feats = model.apply(params, images)
    sims = feats @ target_features.T
    return feats, sims
