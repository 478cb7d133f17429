"""YOLOX detector (CSPDarknet + PAFPN + decoupled head) in Flax.

Native implementation of the architecture behind the reference's detector
ONNX ``yolox_x_body_head_hand_face_0076_..._1x3x480x640`` (4 classes:
body/head/hand/face; consumed at demo_bottrack_onnx_tflite.py:856-1030).
The reference's graph has NMS baked in; here decode happens in
``decode_outputs`` and NMS lives in ops/nms.py so its thresholds are
config, not frozen constants (README.md:199-244 documents retuning them
offline with sam4onnx — we make that a constructor argument).

Input convention matches the reference preprocess (demo:929-966): raw
BGR pixels 0..255, NO normalization, NO channel swap — NHWC on TPU.

Presets follow the YOLOX depth/width multipliers; the reference ships the
X variant (depth 1.33, width 1.25).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from botsort_tpu.models.common import (
    ConvBN,
    CSPLayer,
    Focus,
    SPPBottleneck,
)

YOLOX_PRESETS = {
    # name: (depth_mult, width_mult)
    "nano": (0.33, 0.25),
    "tiny": (0.33, 0.375),
    "s": (0.33, 0.50),
    "m": (0.67, 0.75),
    "l": (1.0, 1.0),
    "x": (1.33, 1.25),
}

STRIDES = (8, 16, 32)


def _d(n: int, depth: float) -> int:
    return max(round(n * depth), 1)


def _w(c: int, width: float) -> int:
    return int(c * width)


class CSPDarknet(nn.Module):
    """splitsum_csp: backbone CSP indices (0=dark2..3=dark5) lowered
    with the concat-free split-sum output stage (models/common.py::
    _SplitSumOut — same params, same math; measured 2x on dark2's
    low-MFU geometry on v5e). Index 0 is the production TPU default
    via build_bundle; the high-MFU later stages keep the concat form.
    """

    depth: float
    width: float
    splitsum_csp: Tuple[int, ...] = ()
    chpad_csp: Tuple[int, ...] = ()
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d, w, dt = self.depth, self.width, self.dtype
        ss = self.splitsum_csp
        cp = self.chpad_csp
        x = Focus(_w(64, w), 3, dtype=dt)(x)                       # stem /2
        x = ConvBN(_w(128, w), 3, 2, dtype=dt)(x)                  # dark2 /4
        x = CSPLayer(_w(128, w), _d(3, d), splitsum=0 in ss,
                     chpad=0 in cp, dtype=dt)(x)
        x = ConvBN(_w(256, w), 3, 2, dtype=dt)(x)                  # dark3 /8
        x = c3 = CSPLayer(_w(256, w), _d(9, d), splitsum=1 in ss,
                          chpad=1 in cp, dtype=dt)(x)
        x = ConvBN(_w(512, w), 3, 2, dtype=dt)(x)                  # dark4 /16
        x = c4 = CSPLayer(_w(512, w), _d(9, d), splitsum=2 in ss,
                          chpad=2 in cp, dtype=dt)(x)
        x = ConvBN(_w(1024, w), 3, 2, dtype=dt)(x)                 # dark5 /32
        x = SPPBottleneck(_w(1024, w), dtype=dt)(x)
        c5 = CSPLayer(_w(1024, w), _d(3, d), shortcut=False,
                      splitsum=3 in ss, chpad=3 in cp, dtype=dt)(x)
        return c3, c4, c5


class PAFPN(nn.Module):
    depth: float
    width: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        d, w, dt = self.depth, self.width, self.dtype
        c3, c4, c5 = feats

        def up(x):
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

        # top-down
        p5 = ConvBN(_w(512, w), 1, 1, dtype=dt)(c5)
        x = jnp.concatenate([up(p5), c4], axis=-1)
        x = CSPLayer(_w(512, w), _d(3, d), shortcut=False, dtype=dt)(x)
        p4 = ConvBN(_w(256, w), 1, 1, dtype=dt)(x)
        x = jnp.concatenate([up(p4), c3], axis=-1)
        n3 = CSPLayer(_w(256, w), _d(3, d), shortcut=False, dtype=dt)(x)
        # bottom-up
        x = ConvBN(_w(256, w), 3, 2, dtype=dt)(n3)
        x = jnp.concatenate([x, p4], axis=-1)
        n4 = CSPLayer(_w(512, w), _d(3, d), shortcut=False, dtype=dt)(x)
        x = ConvBN(_w(512, w), 3, 2, dtype=dt)(n4)
        x = jnp.concatenate([x, p5], axis=-1)
        n5 = CSPLayer(_w(1024, w), _d(3, d), shortcut=False, dtype=dt)(x)
        return n3, n4, n5


class DecoupledHead(nn.Module):
    num_classes: int
    width: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        w, dt = self.width, self.dtype
        hidden = _w(256, w)
        outs = []
        for f in feats:
            x = ConvBN(hidden, 1, 1, dtype=dt)(f)
            cls = ConvBN(hidden, 3, 1, dtype=dt)(x)
            cls = ConvBN(hidden, 3, 1, dtype=dt)(cls)
            cls = nn.Conv(self.num_classes, (1, 1), dtype=dt)(cls)
            reg = ConvBN(hidden, 3, 1, dtype=dt)(x)
            reg = ConvBN(hidden, 3, 1, dtype=dt)(reg)
            box = nn.Conv(4, (1, 1), dtype=dt)(reg)
            obj = nn.Conv(1, (1, 1), dtype=dt)(reg)
            outs.append(jnp.concatenate([box, obj, cls], axis=-1))
        return outs


class YOLOX(nn.Module):
    """Full detector. __call__ returns decoded candidates:

    boxes_tlbr [B, A, 4] (input-image pixels), obj*cls scores [B, A, C].
    A = sum over strides of (H/s * W/s) — 6300 for 480x640.
    """

    num_classes: int = 4
    depth: float = 1.33
    width: float = 1.25
    splitsum_csp: Tuple[int, ...] = ()
    chpad_csp: Tuple[int, ...] = ()
    decode: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images):
        feats = CSPDarknet(self.depth, self.width,
                           splitsum_csp=self.splitsum_csp,
                           chpad_csp=self.chpad_csp,
                           dtype=self.dtype)(images)
        feats = PAFPN(self.depth, self.width, dtype=self.dtype)(feats)
        outs = DecoupledHead(self.num_classes, self.width,
                             dtype=self.dtype)(feats)
        if not self.decode:
            # Raw per-level maps (profiling / alternative decode
            # lowerings; decode has no params, so the tree is shared).
            return outs
        return decode_outputs(outs, self.num_classes)


def decode_outputs(level_outputs: Sequence[jnp.ndarray],
                   num_classes: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode per-level raw maps [B, H, W, 5+C] to boxes + class scores.

    YOLOX decode: xy = (pred_xy + grid) * stride; wh = exp(pred_wh) *
    stride; score[c] = sigmoid(obj) * sigmoid(cls[c]).
    """
    boxes = []
    scores = []
    for out, stride in zip(level_outputs, STRIDES):
        b, h, w, _ = out.shape
        out = out.astype(jnp.float32)
        gy = jnp.arange(h, dtype=jnp.float32)[:, None]
        gx = jnp.arange(w, dtype=jnp.float32)[None, :]
        cx = (out[..., 0] + gx) * stride
        cy = (out[..., 1] + gy) * stride
        # exp clamp: keeps garbage logits (random-init runs, corrupted
        # weights) from overflowing to inf boxes, whose inf-inf
        # arithmetic poisons downstream NMS/KF with NaNs. e^20*stride
        # is ~10^10 px — unreachable by any trained model, so this is
        # identity in production.
        bw = jnp.exp(jnp.minimum(out[..., 2], 20.0)) * stride
        bh = jnp.exp(jnp.minimum(out[..., 3], 20.0)) * stride
        tlbr = jnp.stack(
            [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1)
        obj = nn.sigmoid(out[..., 4:5])
        cls = nn.sigmoid(out[..., 5:])
        boxes.append(tlbr.reshape(b, h * w, 4))
        scores.append((obj * cls).reshape(b, h * w, num_classes))
    return jnp.concatenate(boxes, axis=1), jnp.concatenate(scores, axis=1)
