"""Fused VMEM stencil kernel for the face encoder's depthwise 3x3s.

XLA's grouped-conv lowering is the face encoder's VPU bottleneck
(docs/PERF.md "Face depthwise"): each depthwise 3x3 is ~zero MXU work
but XLA round-trips the activation through HBM per tap-materialization.
The 9-shifted-FMA relowering (facereid._DWConvShift) measured a LOSS
for the same reason — nine shifted operands materialize in HBM.

This kernel reads the padded activation ONCE into VMEM and computes all
nine taps in-register: grid over image tiles, each step loads
(1, H+2, W+2, C), loops output rows, and per row accumulates the nine
(W, C) products in float32 before one bf16 store. Channels ride the
lane dimension (Mosaic implicitly pads C to 128; the waste at C=32/96
is bounded by the layers' small share). Stride-2 blocks keep the XLA
grouped conv: Mosaic has no strided slice, and the four s2 layers sit
at small spatial where the grouped conv is not the bottleneck.

Consumes the IDENTICAL param tree as ``nn.Conv(features, (3, 3),
feature_group_count=features)`` ({'kernel': (3, 3, 1, C)}), so
checkpoints and the ONNX importer are oblivious to the lowering — the
same contract as _DWConvShift. Parity: tests/test_facereid_pallas.py
(interpret mode on CPU vs the grouped-conv Flax path, f32).

Reference parity context: the ops implement the same graph as the
reference's face ReID ONNX (demo_bottrack_onnx_tflite.py:1144-1250
consumes it); this file only changes HOW they execute on TPU.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl


def _dw_kernel(xp_ref, k_ref, out_ref, *, bt: int, h: int, w: int):
    """One grid step: depthwise-3x3 (stride 1, SAME) for `bt` images.

    xp_ref: (bt, h+2, w+2, C) pre-padded input tile in VMEM.
    k_ref:  (9, C) tap weights (float32), row dy*3+dx.
    out_ref: (bt, h, w, C).
    """
    k = k_ref[...]

    def row(n, y):
        acc = jnp.zeros((w, out_ref.shape[-1]), jnp.float32)
        for dy in range(3):
            line = xp_ref[n, y + dy]          # (w+2, C), dynamic row
            lf32 = line.astype(jnp.float32)
            for dx in range(3):
                tap = jax.lax.slice(lf32, (dx, 0), (dx + w, lf32.shape[1]))
                acc = acc + tap * k[dy * 3 + dx][None, :]
        out_ref[n, y] = acc.astype(out_ref.dtype)

    def body(i, _):
        row(i // h, i % h)
        return 0

    jax.lax.fori_loop(0, bt * h, body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _dw_call(xp, k9, out_dtype_name: str, interpret: bool):
    """xp: (N, H+2, W+2, C) padded input; k9: (9, C) f32 taps."""
    n, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    # Tile several images per grid step when spatial is small, so the
    # per-step VMEM block stays ~0.5-2 MB and grid overhead amortizes.
    bt = 1
    isz = xp.dtype.itemsize
    while bt < n and (2 * bt) * hp * wp * max(c, 128) * isz <= (1 << 21) \
            and n % (2 * bt) == 0:
        bt *= 2
    out = pl.pallas_call(
        functools.partial(_dw_kernel, bt=bt, h=h, w=w),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, hp, wp, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c),
                                       jnp.dtype(out_dtype_name)),
        interpret=interpret,
    )(xp, k9)
    return out


def dw_conv3x3_same(x, kernel, out_dtype=None, interpret: bool | None = None):
    """Depthwise 3x3, stride 1, SAME — Pallas VMEM stencil.

    x: (N, H, W, C); kernel: (3, 3, 1, C) (the Flax grouped-conv param).
    Accumulates in float32 regardless of x.dtype (the grouped-conv path
    under dtype=bf16 accumulates in bf16; difference is below the
    pipeline's bf16 tolerance and the f32 parity test is exact-tolerance).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = out_dtype or x.dtype
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    k9 = kernel.reshape(9, kernel.shape[-1]).astype(jnp.float32)
    return _dw_call(xp, k9, jnp.dtype(out_dtype).name, interpret)


class DWConvPallas(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3), feature_group_count=
    features)`` — stride 1 routes to the Pallas stencil, stride 2 keeps
    the XLA grouped conv. Param tree identical to both."""

    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 1, self.features), jnp.float32)
        if self.stride != 1:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                (self.stride, self.stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.features)
        return dw_conv3x3_same(x.astype(self.dtype), kernel,
                               out_dtype=self.dtype)
