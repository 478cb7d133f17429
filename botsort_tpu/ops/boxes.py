"""Box geometry ops over padded, fixed-shape arrays.

Semantics match the reference's host-side numpy loops
(demo_bottrack_onnx_tflite.py:1695-1761) but are fully vectorized: the
reference computes its IoU cost matrix with a nested pure-Python loop
(O(N*M) interpreter overhead per frame); here it is a single broadcasted
VPU expression over ``[A, B]`` tiles.

Box formats (all float32):
  tlbr: (x1, y1, x2, y2)            — corners
  tlwh: (x1, y1, w, h)              — top-left + size
  xywh: (cx, cy, w, h)              — center + size (Kalman state layout)

Padded entries are handled by the caller via validity masks; the math here
is total (no NaNs on degenerate boxes thanks to the <=0 overlap clamp, and
a zero-denominator guard that the reference does not need because its loop
never sees empty boxes — ours can see all-zero padding rows).
"""

from __future__ import annotations

import jax.numpy as jnp


def tlwh_to_tlbr(tlwh: jnp.ndarray) -> jnp.ndarray:
    xy = tlwh[..., :2]
    wh = tlwh[..., 2:4]
    return jnp.concatenate([xy, xy + wh], axis=-1)


def tlbr_to_tlwh(tlbr: jnp.ndarray) -> jnp.ndarray:
    xy = tlbr[..., :2]
    wh = tlbr[..., 2:4] - xy
    return jnp.concatenate([xy, wh], axis=-1)


def tlwh_to_xywh(tlwh: jnp.ndarray) -> jnp.ndarray:
    # demo:663-670 — center = top-left + size/2.
    c = tlwh[..., :2] + tlwh[..., 2:4] / 2.0
    return jnp.concatenate([c, tlwh[..., 2:4]], axis=-1)


def xywh_to_tlwh(xywh: jnp.ndarray) -> jnp.ndarray:
    # demo:624-633 (STrack.tlwh property).
    tl = xywh[..., :2] - xywh[..., 2:4] / 2.0
    return jnp.concatenate([tl, xywh[..., 2:4]], axis=-1)


def xywh_to_tlbr(xywh: jnp.ndarray) -> jnp.ndarray:
    half = xywh[..., 2:4] / 2.0
    c = xywh[..., :2]
    return jnp.concatenate([c - half, c + half], axis=-1)


def iou_matrix(a_tlbr: jnp.ndarray, b_tlbr: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between two padded box sets.

    a_tlbr: [A, 4], b_tlbr: [B, 4] -> [A, B] float32.

    Matches ``bbox_iou`` (demo:1695-1713) elementwise, including the
    strict `<=` no-overlap rule (touching boxes have IoU 0).
    """
    a = a_tlbr[:, None, :]  # [A, 1, 4]
    b = b_tlbr[None, :, :]  # [1, B, 4]
    inter_min = jnp.maximum(a[..., :2], b[..., :2])
    inter_max = jnp.minimum(a[..., 2:4], b[..., 2:4])
    inter_wh = inter_max - inter_min
    overlap = jnp.all(inter_wh > 0.0, axis=-1)
    inter_area = inter_wh[..., 0] * inter_wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    denom = area_a + area_b - inter_area
    iou = jnp.where(denom > 0.0, inter_area / jnp.maximum(denom, 1e-12), 0.0)
    return jnp.where(overlap, iou, 0.0).astype(jnp.float32)


def iou_distance(a_tlbr: jnp.ndarray, b_tlbr: jnp.ndarray) -> jnp.ndarray:
    """1 - IoU cost matrix (demo:1745-1761)."""
    return 1.0 - iou_matrix(a_tlbr, b_tlbr)
