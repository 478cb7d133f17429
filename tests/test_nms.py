"""Fixed-shape NMS vs a straightforward numpy greedy reference."""

import numpy as np
import jax.numpy as jnp

from botsort_tpu.ops import nms
from tests.oracle import boxes_np


def np_nms(boxes, scores, iou_th, score_th, max_out):
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        if scores[i] <= score_th:
            continue
        ok = True
        for j in keep:
            if boxes_np.iou_single(boxes[i], boxes[j]) > iou_th:
                ok = False
                break
        if ok:
            keep.append(i)
        if len(keep) >= max_out:
            break
    return keep


def random_boxes(rng, n):
    x1 = rng.uniform(0, 600, n)
    y1 = rng.uniform(0, 440, n)
    w = rng.uniform(5, 120, n)
    h = rng.uniform(5, 120, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)


def test_single_class_matches_numpy_greedy():
    rng = np.random.default_rng(0)
    for _ in range(10):
        n = 40
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = np.ones(n, dtype=bool)
        b, s, v, clipped = nms.nms_single_class(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            iou_threshold=0.5, score_threshold=0.15, max_outputs=20)
        assert not bool(clipped)
        got = set()
        b_np, s_np, v_np = np.asarray(b), np.asarray(s), np.asarray(v)
        for i in range(20):
            if v_np[i]:
                got.add((tuple(np.round(b_np[i], 3)), round(float(s_np[i]), 5)))
        want = set()
        for i in np_nms(boxes, scores, 0.5, 0.15, 20):
            want.add((tuple(np.round(boxes[i], 3)), round(float(scores[i]), 5)))
        assert got == want


def test_multiclass_keeps_classes_independent():
    # Two perfectly overlapping boxes of different classes both survive.
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=np.float32)
    scores = np.array([0.9, 0.8], dtype=np.float32)
    cls = np.array([0, 1], dtype=np.int32)
    valid = np.ones(2, dtype=bool)
    det = nms.multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls),
        jnp.asarray(valid), num_classes=4, iou_threshold=0.5,
        score_threshold=0.15, max_per_class=5)
    v = np.asarray(det.valid)
    assert v[0].sum() == 1 and v[1].sum() == 1
    assert v[2].sum() == 0 and v[3].sum() == 0


def test_max_per_class_cap():
    rng = np.random.default_rng(1)
    # 30 disjoint boxes, cap at 8.
    boxes = np.stack([
        np.arange(30) * 20.0, np.zeros(30),
        np.arange(30) * 20.0 + 15, np.full(30, 15.0)], axis=-1).astype(
            np.float32)
    scores = rng.uniform(0.5, 1.0, 30).astype(np.float32)
    b, s, v, _ = nms.nms_single_class(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.ones(30, dtype=bool), 0.5, 0.15, 8)
    assert np.asarray(v).sum() == 8
    # Should be the top-8 scores.
    want = np.sort(scores)[-8:]
    np.testing.assert_allclose(np.sort(np.asarray(s)[np.asarray(v)]), want,
                               rtol=1e-6)


def test_pre_nms_top_k_clip_flag():
    # 12 candidates above threshold, sweep width 8 -> clipped set and the
    # top-8 kept exactly.
    boxes = np.stack([
        np.arange(12) * 20.0, np.zeros(12),
        np.arange(12) * 20.0 + 15, np.full(12, 15.0)], axis=-1).astype(
            np.float32)
    scores = np.linspace(0.9, 0.3, 12).astype(np.float32)
    b, s, v, clipped = nms.nms_single_class(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(12, dtype=bool),
        0.5, 0.15, 12, pre_nms_top_k=8)
    assert bool(clipped)
    assert np.asarray(v).sum() == 8
    b2, s2, v2, clipped2 = nms.nms_single_class(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(12, dtype=bool),
        0.5, 0.15, 12, pre_nms_top_k=16)
    assert not bool(clipped2)
    assert np.asarray(v2).sum() == 12
