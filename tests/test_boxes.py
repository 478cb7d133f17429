"""Vectorized IoU / conversions vs the looped numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from botsort_tpu.ops import boxes
from tests.oracle import boxes_np


def random_tlbr(rng, n):
    x1 = rng.uniform(0, 600, n)
    y1 = rng.uniform(0, 440, n)
    w = rng.uniform(1, 200, n)
    h = rng.uniform(1, 200, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)


def test_iou_matrix_matches_oracle():
    rng = np.random.default_rng(0)
    a = random_tlbr(rng, 13)
    b = random_tlbr(rng, 7)
    got = np.asarray(jax.jit(boxes.iou_matrix)(jnp.asarray(a), jnp.asarray(b)))
    want = boxes_np.iou_matrix(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_iou_touching_boxes_is_zero():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[10.0, 0.0, 20.0, 10.0]])  # shares an edge
    assert float(boxes.iou_matrix(a, b)[0, 0]) == 0.0


def test_iou_degenerate_padding_rows_are_finite():
    a = jnp.zeros((4, 4))  # all-zero padding boxes
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    out = boxes.iou_matrix(a, b)
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.max()) == 0.0


def test_conversions_roundtrip():
    rng = np.random.default_rng(1)
    tlbr = jnp.asarray(random_tlbr(rng, 9))
    tlwh = boxes.tlbr_to_tlwh(tlbr)
    np.testing.assert_allclose(
        np.asarray(boxes.tlwh_to_tlbr(tlwh)), np.asarray(tlbr), rtol=1e-6
    )
    xywh = boxes.tlwh_to_xywh(tlwh)
    np.testing.assert_allclose(
        np.asarray(boxes.xywh_to_tlwh(xywh)), np.asarray(tlwh), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(boxes.xywh_to_tlbr(xywh)), np.asarray(tlbr), rtol=1e-5
    )
