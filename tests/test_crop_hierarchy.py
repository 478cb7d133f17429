"""crop_and_resize vs cv2, and greedy hierarchy vs a numpy oracle."""

import numpy as np
import cv2
import jax.numpy as jnp

from botsort_tpu.ops import crop, hierarchy
from tests.oracle import boxes_np


def test_crop_resize_matches_cv2():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
    boxes = np.array([
        [10, 20, 74, 100],
        [0, 0, 160, 120],
        [50, 30, 58, 46],
    ], dtype=np.float32)
    out = np.asarray(crop.crop_and_resize(
        jnp.asarray(img), jnp.asarray(boxes), (64, 32)))
    for i, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
        ref = cv2.resize(img[y1:y2, x1:x2], (32, 64),
                         interpolation=cv2.INTER_LINEAR)
        # cv2 uses fixed-point bilinear; allow ~1 intensity unit.
        assert np.abs(out[i] - ref).max() < 1.0, i


def test_crop_resize_bf16_close_to_f32():
    """The production path runs the interpolation contractions in
    bfloat16 (f32 accumulation): uint8 pixels are exact in bf16 and the
    2-tap weights round at ~2^-9, so crops stay within ~1 intensity
    level of the float32 path."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
    boxes = np.array([
        [10, 20, 74, 100],
        [0, 0, 160, 120],
        [50, 30, 58, 46],
    ], dtype=np.float32)
    f32 = np.asarray(crop.crop_and_resize(
        jnp.asarray(img), jnp.asarray(boxes), (64, 32)))
    bf16 = np.asarray(crop.crop_and_resize(
        jnp.asarray(img), jnp.asarray(boxes), (64, 32),
        compute_dtype=jnp.bfloat16))
    assert np.abs(f32 - bf16).max() < 1.0


def test_gather_matches_einsum():
    """The gather lowering computes the SAME bilinear samples as the
    one-hot-matmul form: exact in float32 (same taps, same weights, only
    the contraction order differs), within ~3 intensity levels in bf16
    (the gather path's lerps round intermediates to bf16 where the
    einsum accumulates in f32)."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (240, 320, 3)).astype(np.uint8)
    boxes = []
    for _ in range(17):
        x1 = rng.uniform(0, 280)
        y1 = rng.uniform(0, 200)
        boxes.append([x1, y1, x1 + rng.uniform(0.5, 40),
                      y1 + rng.uniform(0.5, 40)])
    boxes = np.floor(np.asarray(boxes, np.float32))
    a = np.asarray(crop.crop_and_resize(
        jnp.asarray(img), jnp.asarray(boxes), (64, 32)))
    g = np.asarray(crop.crop_and_resize_gather(
        jnp.asarray(img), jnp.asarray(boxes), (64, 32)))
    assert np.abs(a - g).max() < 1e-3
    g16 = np.asarray(crop.crop_and_resize_gather(
        jnp.asarray(img), jnp.asarray(boxes), (64, 32),
        compute_dtype=jnp.bfloat16))
    assert np.abs(a - g16).max() < 3.0


def test_int8_crop_close_to_f32():
    """The int8-x-phase lowering's only approximation is rounding the
    2-tap weights to 1/127 steps: <= ~1 intensity level vs float32
    (plus the bf16 y phase's ~0.5); dequantization is exact integer
    math (weight rows sum to exactly 127)."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (240, 320, 3)).astype(np.uint8)
    boxes = []
    for _ in range(13):
        x1 = rng.uniform(0, 280)
        y1 = rng.uniform(0, 200)
        boxes.append([x1, y1, x1 + rng.uniform(1, 40),
                      y1 + rng.uniform(1, 40)])
    boxes = np.floor(np.asarray(boxes, np.float32))
    f32 = np.asarray(crop.crop_and_resize(
        jnp.asarray(img), jnp.asarray(boxes), (64, 32)))
    q = np.asarray(crop.crop_and_resize_int8(
        jnp.asarray(img), jnp.asarray(boxes), (64, 32)))
    assert np.abs(f32 - q).max() < 1.6


def test_crop_degenerate_box_is_zero():
    img = jnp.ones((50, 50, 3))
    boxes = jnp.asarray([[10.0, 10.0, 10.0, 30.0]])  # zero width
    out = np.asarray(crop.crop_and_resize(img, boxes, (8, 8)))
    assert (out == 0).all()


def np_greedy(bases, targets, base_valid, target_valid, rounds=1):
    used = [not v for v in target_valid]
    picks = [[] for _ in range(rounds)]
    for bi, base in enumerate(bases):
        if not base_valid[bi]:
            for r in range(rounds):
                picks[r].append(-1)
            continue
        for r in range(rounds):
            best, best_iou, best_d = -1, 0.0, float("inf")
            bc = ((base[0] + base[2]) / 2, (base[1] + base[3]) / 2)
            for ti, tgt in enumerate(targets):
                if used[ti]:
                    continue
                i = boxes_np.iou_single(base, tgt)
                tc = ((tgt[0] + tgt[2]) / 2, (tgt[1] + tgt[3]) / 2)
                d = ((bc[0] - tc[0]) ** 2 + (bc[1] - tc[1]) ** 2) ** 0.5
                if i > best_iou or (i > 0 and i == best_iou and d < best_d):
                    best, best_iou, best_d = ti, i, d
            if best >= 0:
                used[best] = True
            picks[r].append(best)
    return picks


def test_greedy_assign_matches_numpy():
    rng = np.random.default_rng(2)
    for _ in range(8):
        nb, nt = 6, 9
        bases = np.stack([
            rng.uniform(0, 100, nb), rng.uniform(0, 100, nb),
            np.zeros(nb), np.zeros(nb)], axis=-1)
        bases[:, 2] = bases[:, 0] + rng.uniform(20, 60, nb)
        bases[:, 3] = bases[:, 1] + rng.uniform(20, 60, nb)
        targets = np.stack([
            rng.uniform(0, 100, nt), rng.uniform(0, 100, nt),
            np.zeros(nt), np.zeros(nt)], axis=-1)
        targets[:, 2] = targets[:, 0] + rng.uniform(10, 40, nt)
        targets[:, 3] = targets[:, 1] + rng.uniform(10, 40, nt)
        bv = np.ones(nb, dtype=bool)
        tv = rng.uniform(size=nt) > 0.2
        (got,) = hierarchy.greedy_assign(
            jnp.asarray(bases, dtype=jnp.float32), jnp.asarray(bv),
            jnp.asarray(targets, dtype=jnp.float32), jnp.asarray(tv))
        want = np_greedy(bases, targets, bv, tv)[0]
        assert list(np.asarray(got)) == want


def test_greedy_two_rounds_interleaved():
    # One body, two hands: both claimed by the same body in order.
    body = jnp.asarray([[0.0, 0.0, 100.0, 100.0], [200.0, 0.0, 300.0, 100.0]])
    hands = jnp.asarray([
        [10.0, 10.0, 30.0, 30.0],   # inside body 0
        [60.0, 60.0, 90.0, 90.0],   # inside body 0
        [210.0, 10.0, 230.0, 30.0]  # inside body 1
    ])
    h1, h2 = hierarchy.greedy_assign(
        body, jnp.ones(2, dtype=bool), hands, jnp.ones(3, dtype=bool),
        rounds=2)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert set([h1[0], h2[0]]) == {0, 1}
    assert h1[1] == 2 and h2[1] == -1
