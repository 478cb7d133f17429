"""FastReID SBS(S50) body ReID encoder in Flax: ResNeSt-50 + GeM + BNNeck.

Native implementation of the architecture behind the reference's body
ReID ONNX ``mot17/mot20_sbs_S50_NMx3x{256..384}x128_post_feature_only``
(consumed at demo_bottrack_onnx_tflite.py:1032-1142): the FastReID
"stronger baseline" config with a ResNeSt-50 backbone (split-attention
bottlenecks, deep stem, average-pool downsampling, last stride 1),
generalized-mean pooling and a BNNeck, producing a 2048-d embedding.

The reference fuses L2-normalization and the N x M cosine-similarity
matmul against tracked features INTO the ONNX graph (README.md:185-195)
so the host never touches raw features; ``encode_and_compare`` keeps that
contract as a jitted function (the matmul rides the MXU).

Input convention matches the reference preprocess (demo:1124-1141):
RGB (reference converts BGR->RGB), /255, ImageNet mean/std — applied by
the pipeline before this module; the module takes normalized NHWC.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class _ConvBN(nn.Module):
    """Conv + BN (+ReLU).

    dense_groups: lower a grouped conv (groups>1) as ONE plain conv
    with a block-diagonal kernel built from the same params at apply
    time. Mathematically exact (the off-block weights are zero); on
    TPU a small-channel grouped conv splits the MXU into per-group
    matmuls at a fraction of the 128 lanes, while the dense form runs
    one full-width matmul (2x the nominal FLOPs, but the FLOPs were
    idle lanes anyway). Param tree is identical in both modes.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.bfloat16
    dense_groups: bool = False

    @nn.compact
    def __call__(self, x):
        import jax

        p = (self.kernel - 1) // 2
        conv = nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=((p, p), (p, p)),
                       feature_group_count=self.groups, use_bias=False,
                       dtype=self.dtype, name="Conv_0")
        if (self.groups > 1 and self.dense_groups
                and not self.is_initializing()):
            kg = self.variables["params"]["Conv_0"]["kernel"]
            cin = x.shape[-1]
            cg = cin // self.groups
            fg = self.features // self.groups
            dense = jnp.zeros(
                (self.kernel, self.kernel, cin, self.features), kg.dtype)
            for g in range(self.groups):
                dense = dense.at[
                    :, :, g * cg:(g + 1) * cg, g * fg:(g + 1) * fg].set(
                        kg[:, :, :, g * fg:(g + 1) * fg])
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), dense.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            x = conv(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype)(x)
        return nn.relu(x) if self.act else x


class SplAtConv(nn.Module):
    """Split-attention 3x3 convolution (ResNeSt), radix 2, cardinality 1.

    flat_attention: compute the radix softmax + weighted combine on
    lane slices of the rank-4 conv output instead of materializing the
    rank-5 ``(B, H, W, r, C)`` split view. Same values, same params —
    rank-5 reshapes/broadcasts at large spatial force relayouts on TPU
    that scale with the pixel count.
    """

    features: int
    radix: int = 2
    reduction: int = 4
    dtype: Any = jnp.bfloat16
    dense_groups: bool = False
    flat_attention: bool = False

    @nn.compact
    def __call__(self, x):
        c, r = self.features, self.radix
        x = _ConvBN(c * r, 3, 1, groups=r, dtype=self.dtype,
                    dense_groups=self.dense_groups)(x)
        b, h, w, _ = x.shape
        if self.flat_attention:
            # Lane-sliced form of the block below: channel lane order is
            # radix-major ([radix0 C | radix1 C | ...]), so the rank-5
            # split view's radix axis is a lane slice.
            gap = x[..., 0:c]
            for g in range(1, r):
                gap = gap + x[..., g * c:(g + 1) * c]
            gap = jnp.mean(gap, axis=(1, 2))                      # [B, C]
            inter = max(c * r // self.reduction, 32)
            z = nn.Dense(inter, dtype=self.dtype)(gap)
            z = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             dtype=self.dtype)(z)
            z = nn.relu(z)
            atten = nn.Dense(c * r, dtype=self.dtype)(z)
            a = atten.astype(jnp.float32)
            cols = [a[:, g * c:(g + 1) * c] for g in range(r)]
            m = cols[0]
            for col in cols[1:]:
                m = jnp.maximum(m, col)
            es = [jnp.exp(col - m) for col in cols]
            tot = es[0]
            for e in es[1:]:
                tot = tot + e
            out = None
            for g in range(r):
                w_g = (es[g] / tot).astype(self.dtype)[:, None, None, :]
                term = x[..., g * c:(g + 1) * c] * w_g
                out = term if out is None else out + term
            return out
        splits = x.reshape(b, h, w, r, c)
        gap = jnp.mean(jnp.sum(splits, axis=3), axis=(1, 2))      # [B, C]
        inter = max(c * r // self.reduction, 32)
        z = nn.Dense(inter, dtype=self.dtype)(gap)
        z = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype)(z)
        z = nn.relu(z)
        atten = nn.Dense(c * r, dtype=self.dtype)(z).reshape(b, r, c)
        atten = nn.softmax(atten.astype(jnp.float32), axis=1).astype(
            self.dtype)                                           # rSoftmax
        return jnp.sum(splits * atten[:, None, None, :, :], axis=3)


class SplAtBottleneck(nn.Module):
    """ResNeSt bottleneck: 1x1 -> SplAt 3x3 (+avd pool on stride) -> 1x1 x4."""

    width: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16
    dense_groups: bool = False
    flat_attention: bool = False

    @nn.compact
    def __call__(self, x):
        out_ch = self.width * 4
        y = _ConvBN(self.width, 1, 1, dtype=self.dtype)(x)
        y = SplAtConv(self.width, dtype=self.dtype,
                      dense_groups=self.dense_groups,
                      flat_attention=self.flat_attention)(y)
        if self.stride > 1:
            # avd: average-pool downsampling after the split-attention conv.
            y = nn.avg_pool(y, (3, 3), strides=(self.stride, self.stride),
                            padding=((1, 1), (1, 1)))
        y = _ConvBN(out_ch, 1, 1, act=False, dtype=self.dtype)(y)
        if self.downsample:
            # avg_down shortcut: avgpool then 1x1 conv.
            s = x
            if self.stride > 1:
                s = nn.avg_pool(s, (self.stride, self.stride),
                                strides=(self.stride, self.stride))
            s = _ConvBN(out_ch, 1, 1, act=False, dtype=self.dtype)(s)
        else:
            s = x
        return nn.relu(y + s)


class ResNeSt50(nn.Module):
    """ResNeSt trunk with last_stride=1 (FastReID convention).

    Defaults are ResNeSt-50: deep stem (32/32/64), stage widths
    (64, 128, 256, 512) x4 expansion, block counts (3, 4, 6, 3).
    `stage_blocks`/`stage_widths`/`stem_width` are exposed so tests can
    run a miniature trunk (CPU per-op compilation in CI is slow).

    fused_stem: run the stem + stage 1 as ONE fused Pallas kernel
    (models/fastreid_pallas.py) — the two segments are HBM-bound at
    ~12% MFU under XLA and dominate half the encoder's time. The
    kernel is weight-exact vs this module's params up to bf16 rounding
    (tests/test_fastreid_pallas.py); falls back to the plain path at
    init time or unsupported geometry. Param trees are IDENTICAL in
    both modes (explicit names pin the compact auto-naming).
    """

    stage_blocks: tuple = (3, 4, 6, 3)
    stage_widths: tuple = (64, 128, 256, 512)
    stem_width: int = 32
    dtype: Any = jnp.bfloat16
    fused_stem: bool = False
    dgfa_stages: tuple = ()

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        sw = self.stem_width
        use_fused = (
            self.fused_stem
            and not self.is_initializing()
            and self.stage_blocks[0] == 3
            and dt == jnp.bfloat16
        )
        if use_fused:
            from botsort_tpu.models import fastreid_pallas as fsp
            use_fused = fsp.geometry_ok(int(x.shape[1]), int(x.shape[2]))
        start = 0
        if use_fused:
            from botsort_tpu.models import fastreid_pallas as fsp
            v = self.variables
            stem_vars = [
                {"params": v["params"][f"_ConvBN_{i}"],
                 "batch_stats": v["batch_stats"][f"_ConvBN_{i}"]}
                for i in range(3)]
            block_vars = [
                {"params": v["params"][f"SplAtBottleneck_{i}"],
                 "batch_stats": v["batch_stats"][f"SplAtBottleneck_{i}"]}
                for i in range(3)]
            x = fsp.stem_stage1(x, stem_vars, block_vars, sw,
                                self.stage_widths[0])
            start = 3
        else:
            # Deep stem: 3x 3x3 convs then maxpool.
            x = _ConvBN(sw, 3, 2, dtype=dt, name="_ConvBN_0")(x)
            x = _ConvBN(sw, 3, 1, dtype=dt, name="_ConvBN_1")(x)
            x = _ConvBN(sw * 2, 3, 1, dtype=dt, name="_ConvBN_2")(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        strides = (1, 2, 2, 1)  # last_stride=1
        idx = 0
        for si, (width, blocks, stride) in enumerate(
                zip(self.stage_widths, self.stage_blocks, strides)):
            dgfa = si in self.dgfa_stages
            for i in range(blocks):
                if idx >= start:
                    x = SplAtBottleneck(
                        width,
                        stride=stride if i == 0 else 1,
                        downsample=(i == 0),
                        dtype=dt,
                        dense_groups=dgfa,
                        flat_attention=dgfa,
                        name=f"SplAtBottleneck_{idx}",
                    )(x)
                idx += 1
        return x                                                  # [B,H/16,W/16,4*w3]


class GeMPool(nn.Module):
    """Generalized-mean pooling with learnable exponent p (init 3.0)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        p = self.param("p", lambda k: jnp.asarray(3.0, jnp.float32))
        x = x.astype(jnp.float32)
        x = jnp.clip(x, self.eps, None) ** p
        return jnp.mean(x, axis=(1, 2)) ** (1.0 / p)


class FastReIDSBS(nn.Module):
    """Full encoder: trunk -> GeM -> BNNeck -> 2048-d embedding."""

    feature_dim: int = 2048
    stage_blocks: tuple = (3, 4, 6, 3)
    stage_widths: tuple = (64, 128, 256, 512)
    stem_width: int = 32
    dtype: Any = jnp.bfloat16
    fused_stem: bool = False
    dgfa_stages: tuple = ()

    @nn.compact
    def __call__(self, images):
        """images: [N, H, W, 3] normalized RGB. Returns [N, D] float32
        L2-normalized embeddings (normalization fused, as in the
        reference ONNX post-process)."""
        x = ResNeSt50(self.stage_blocks, self.stage_widths,
                      self.stem_width, dtype=self.dtype,
                      fused_stem=self.fused_stem,
                      dgfa_stages=self.dgfa_stages)(
                          images.astype(self.dtype))
        feat = GeMPool()(x)
        # BNNeck (FastReID: BatchNorm1d, no classifier at inference).
        feat = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                            dtype=jnp.float32)(feat)
        norm = jnp.linalg.norm(feat, axis=-1, keepdims=True)
        return (feat / jnp.maximum(norm, 1e-12)).astype(jnp.float32)


def encode_and_compare(
    model: FastReIDSBS,
    params,
    images: jnp.ndarray,
    target_features: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The reference ONNX contract (README.md:185-195):

    (base_images [N,H,W,3], target_features [M,D]) ->
    (similarities [N,M], base_features [N,D]).
    """
    feats = model.apply(params, images)
    sims = feats @ target_features.T
    return sims, feats


def preprocess(images_bgr: jnp.ndarray) -> jnp.ndarray:
    """BGR uint8/float [N,H,W,3] -> normalized RGB float32 (demo:1136-1140)."""
    rgb = images_bgr[..., ::-1].astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (rgb - mean) / std
