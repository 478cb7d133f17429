"""Shared conv blocks for the detection / ReID backbones.

All modules are inference-oriented: BatchNorm runs with stored running
statistics (`use_running_average=True`), layouts are NHWC (TPU-native;
the reference's ONNX graphs are NCHW — the weight importer transposes),
and a `dtype` parameter selects the compute precision (bfloat16 by
default on TPU, float32 params).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + activation (the YOLOX "BaseConv").

    pad_in / pad_out: channel-pad (chpad) lowering. The conv consumes
    ``cin + pad_in`` input channels (the extra kernel rows are ZERO, so
    any values in the padded input lanes are ignored) and emits
    ``features + pad_out`` channels (the extra kernel columns are zero;
    BN runs with zero scale/bias and unit variance on the pad, so pad
    outputs are exactly act(0)). Mathematically identical on the first
    ``features`` channels; the point is MXU lane occupancy — a
    sub-128-channel conv leaves output lanes idle, and padding to the
    128 boundary trades nominal FLOPs (which were idle lanes) for full
    tiles (measured on dark2, docs/PERF.md). Param tree is IDENTICAL
    (Conv_0/BatchNorm_0 created as usual; the padded kernel is built at
    apply time), but the lowering bypasses ``nn.Conv.__call__`` — keep
    it OFF when importing weights (same caveat as dgfa/splitsum).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: Callable | None = nn.silu
    dtype: Dtype = jnp.bfloat16
    pad_in: int = 0
    pad_out: int = 0

    @nn.compact
    def __call__(self, x):
        import jax

        pad = (self.kernel - 1) // 2
        conv = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="Conv_0",
        )
        bn = nn.BatchNorm(
            use_running_average=True,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            name="BatchNorm_0",
        )
        if ((self.pad_in or self.pad_out)
                and not self.is_initializing()):
            assert self.groups == 1, "chpad assumes an ungrouped conv"
            k = self.variables["params"]["Conv_0"]["kernel"]
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, self.pad_in),
                             (0, self.pad_out)))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kp.astype(self.dtype),
                (self.stride, self.stride), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # flax BatchNorm inference math, with padded stats: f32
            # promotion, then ((x - mean) * (rsqrt(var+eps) * scale))
            # + bias, then the cast — matching nn.BatchNorm's
            # _normalize exactly so the real channels are bit-identical
            # (flax 0.12 _normalize with force_float32_reductions).
            bnp = self.variables["params"]["BatchNorm_0"]
            bns = self.variables["batch_stats"]["BatchNorm_0"]
            po = (0, self.pad_out)
            mean = jnp.pad(bns["mean"], po)
            var = jnp.pad(bns["var"], po, constant_values=1.0)
            mul = jax.lax.rsqrt(var + 1e-3) * jnp.pad(bnp["scale"], po)
            bias = jnp.pad(bnp["bias"], po)
            y = (y - mean) * mul + bias
            x = y.astype(self.dtype)
        else:
            x = bn(conv(x))
        if self.act is not None:
            x = self.act(x)
        return x


class DWConv(nn.Module):
    """Depthwise + pointwise conv pair (YOLOX "DWConv")."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: Callable | None = nn.silu
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = ConvBN(x.shape[-1], self.kernel, self.stride,
                   groups=x.shape[-1], act=self.act, dtype=self.dtype)(x)
        x = ConvBN(self.features, 1, 1, act=self.act, dtype=self.dtype)(x)
        return x


class Bottleneck(nn.Module):
    """chpad: channel-pad target width for the whole bottleneck — both
    convs consume AND emit ``chpad``-wide activations (zero kernel
    rows/cols beyond the real channels; see ConvBN). The residual add
    then runs on padded tensors whose pad lanes are exactly act(0) on
    both sides."""

    features: int
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Dtype = jnp.bfloat16
    chpad: int = 0

    @nn.compact
    def __call__(self, x):
        hidden = int(self.features * self.expansion)
        p_h = max(self.chpad - hidden, 0)
        p_f = max(self.chpad - self.features, 0)
        y = ConvBN(hidden, 1, 1, dtype=self.dtype,
                   pad_in=p_f if self.chpad else 0, pad_out=p_h)(x)
        y = ConvBN(self.features, 3, 1, dtype=self.dtype,
                   pad_in=p_h, pad_out=p_f)(y)
        if self.shortcut and x.shape[-1] == self.features + p_f:
            y = y + x
        return y


class _ConvKernel(nn.Module):
    """Creates the param ``kernel`` exactly where an ``nn.Conv`` would.

    Used by the splitsum CSP output stage so its param tree (path,
    shape, init distribution, and the PRNG fold — explicit child name
    "Conv_0") is indistinguishable from the plain ``ConvBN`` it
    replaces: checkpoints and the ONNX importer see the same layer.
    """

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _SplitSumOut(nn.Module):
    """``ConvBN(features, 1, 1)(concat([a, b]))`` without the concat.

    concat([a, b]) @ W == a @ W[:h] + b @ W[h:] — the 1x1 conv is
    linear in its input channels, so slicing the kernel is exact in
    exact arithmetic (bf16 MXU accumulation is f32 either way; the
    final rounding of the two-partial sum can differ in the last ulp).
    Skipping the concat avoids materializing + relayouting the
    full-width activation in HBM; measured 2x on the detector's dark2
    geometry (docs/PERF.md, tools/perf_probe.py --stages dark2var).

    Param tree matches ConvBN (Conv_0/kernel + BatchNorm_0) so the
    variants share checkpoints. NOTE: the kernel here is not created by
    an ``nn.Conv.__call__``, so tools/import_onnx.py's execution-order
    interceptor cannot see it — keep splitsum OFF when importing
    weights (imports run on CPU, where the build_bundle gate already
    disables it).
    """

    features: int
    act: Callable | None = nn.silu
    dtype: Dtype = jnp.bfloat16
    a_real: int | None = None

    @nn.compact
    def __call__(self, a, b):
        import jax

        # a may arrive channel-PADDED (CSPLayer chpad): a_real is the
        # real channel count the stored kernel covers; the pad rows get
        # zero weights, so the padded lanes are ignored exactly.
        h = self.a_real if self.a_real is not None else a.shape[-1]
        cin = h + b.shape[-1]
        kernel = _ConvKernel((1, 1, cin, self.features), name="Conv_0")()
        k = kernel.astype(self.dtype)
        ka = k[:, :, :h, :]
        if a.shape[-1] != h:
            ka = jnp.pad(ka, ((0, 0), (0, 0),
                              (0, a.shape[-1] - h), (0, 0)))
        dn = ("NHWC", "HWIO", "NHWC")
        ya = jax.lax.conv_general_dilated(
            a.astype(self.dtype), ka, (1, 1), "VALID",
            dimension_numbers=dn)
        yb = jax.lax.conv_general_dilated(
            b.astype(self.dtype), k[:, :, h:, :], (1, 1), "VALID",
            dimension_numbers=dn)
        x = nn.BatchNorm(use_running_average=True, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype,
                         name="BatchNorm_0")(ya + yb)
        if self.act is not None:
            x = self.act(x)
        return x


class CSPLayer(nn.Module):
    """Cross-stage-partial layer (YOLOX "CSPLayer" / C3).

    splitsum=True computes the output 1x1 ConvBN as a concat-free
    split-sum (see _SplitSumOut) — same params, same math; measured 2x
    on dark2's low-MFU geometry on v5e, where the 160-channel concat
    forces an activation relayout between the branches.
    """

    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    splitsum: bool = False
    chpad: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hidden = int(self.features * self.expansion)
        # chpad: run the hidden bottleneck chain at the 128-lane
        # boundary (zero-extended kernels; see ConvBN.pad_*) so its
        # sub-128-channel convs fill MXU output tiles. Implies the
        # splitsum output stage, whose a-kernel is row-padded to match.
        hp = 128 if (self.chpad and hidden < 128
                     and not self.is_initializing()) else hidden
        a = ConvBN(hidden, 1, 1, dtype=self.dtype,
                   pad_out=hp - hidden)(x)
        b = ConvBN(hidden, 1, 1, dtype=self.dtype)(x)
        for _ in range(self.n):
            a = Bottleneck(hidden, self.shortcut, 1.0, dtype=self.dtype,
                           chpad=hp if hp != hidden else 0)(a)
        if self.splitsum or hp != hidden:
            return _SplitSumOut(self.features, dtype=self.dtype,
                                a_real=hidden,
                                name="ConvBN_2")(a, b)
        y = jnp.concatenate([a, b], axis=-1)
        return ConvBN(self.features, 1, 1, dtype=self.dtype)(y)


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling (kernel sizes 5/9/13)."""

    features: int
    kernels: Tuple[int, ...] = (5, 9, 13)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hidden = x.shape[-1] // 2
        x = ConvBN(hidden, 1, 1, dtype=self.dtype)(x)
        pools = [x]
        for k in self.kernels:
            pools.append(
                nn.max_pool(x, (k, k), strides=(1, 1),
                            padding=((k // 2, k // 2), (k // 2, k // 2))))
        x = jnp.concatenate(pools, axis=-1)
        return ConvBN(self.features, 1, 1, dtype=self.dtype)(x)


class Focus(nn.Module):
    """YOLOX stem. Reference semantics: 4x subsampled pixel phases
    stacked on channels (space-to-depth), then a 3x3 conv on 12
    channels.

    fold=True (default) runs the mathematically IDENTICAL single 6x6
    stride-2 convolution on the raw 3 channels instead: output (i, j)
    of the space-to-depth 3x3 conv reads input rows 2i-2..2i+3 / cols
    2j-2..2j+3 — exactly a 6x6/s2/pad-2 window — and the 3x3x12 kernel
    maps bijectively onto 6x6x3 (tools/import_onnx.py::
    focus_weight_to_conv6 converts the reference's exported weights;
    tests/test_focus_fold.py proves equivalence). Same FLOPs, but no
    4-way strided-slice + concat materialization of the full frame in
    HBM, and XLA sees one plain strided conv. (YOLOv5 made the same
    swap on GPUs.)
    """

    features: int
    kernel: int = 3
    fold: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.fold:
            if self.kernel != 3:
                raise ValueError("folded Focus assumes the 3x3 kernel")
            x = nn.Conv(self.features, (6, 6), strides=(2, 2),
                        padding=((2, 2), (2, 2)), use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=True, momentum=0.97,
                             epsilon=1e-3, dtype=self.dtype)(x)
            return nn.silu(x)
        tl = x[:, 0::2, 0::2, :]
        bl = x[:, 1::2, 0::2, :]
        tr = x[:, 0::2, 1::2, :]
        br = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return ConvBN(self.features, self.kernel, 1, dtype=self.dtype)(x)
