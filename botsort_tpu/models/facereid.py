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

import jax.numpy as jnp
from flax import linen as nn


class _ConvBNRelu6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
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

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = _ConvBNRelu6(hidden, 1, 1, dtype=self.dtype)(y)
        y = _ConvBNRelu6(hidden, 3, self.stride, groups=hidden,
                         dtype=self.dtype)(y)
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

    @nn.compact
    def __call__(self, images):
        """images: [N, 128, 128, 3] raw BGR 0..255. Returns [N, 256]
        float32 L2-normalized embeddings."""
        x = images.astype(self.dtype)
        x = _ConvBNRelu6(32, 3, 2, dtype=self.dtype)(x)
        for expand, ch, reps, stride in self.layout:
            for i in range(reps):
                x = InvertedResidual(ch, stride if i == 0 else 1, expand,
                                     dtype=self.dtype)(x)
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
