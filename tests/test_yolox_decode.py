"""YOLOX decode + source-rescale correctness vs a numpy oracle.

Random-weight pipeline tests can't detect coordinate bugs (any box is as
good as another); these verify the decode math itself: grid offsets,
stride scaling, exp(wh), sigmoid score fusion, and the reference's
clamp+truncate rescale (demo_bottrack_onnx_tflite.py:1009-1012).
"""

import numpy as np
import jax.numpy as jnp

from botsort_tpu.models.yolox import STRIDES, decode_outputs
from botsort_tpu.pipeline.frame_step import _rescale_to_source


def np_decode(levels, num_classes):
    boxes, scores = [], []
    for out, stride in zip(levels, STRIDES):
        b, h, w, _ = out.shape
        for yy in range(h):
            for xx in range(w):
                v = out[0, yy, xx].astype(np.float64)
                cx = (v[0] + xx) * stride
                cy = (v[1] + yy) * stride
                bw = np.exp(v[2]) * stride
                bh = np.exp(v[3]) * stride
                boxes.append([cx - bw / 2, cy - bh / 2,
                              cx + bw / 2, cy + bh / 2])
                obj = 1 / (1 + np.exp(-v[4]))
                cls = 1 / (1 + np.exp(-v[5:5 + num_classes]))
                scores.append(obj * cls)
    return np.array(boxes), np.array(scores)


def test_decode_matches_numpy():
    rng = np.random.default_rng(0)
    h, w = 32, 64  # input /8 /16 /32 -> (4,8),(2,4),(1,2)
    levels = [
        rng.normal(size=(1, h // s, w // s, 5 + 4)).astype(np.float32)
        for s in STRIDES
    ]
    got_b, got_s = decode_outputs([jnp.asarray(l) for l in levels], 4)
    want_b, want_s = np_decode(levels, 4)
    np.testing.assert_allclose(np.asarray(got_b)[0], want_b, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s)[0], want_s, rtol=1e-4,
                               atol=1e-5)


def test_decode_anchor_count_480x640():
    rng = np.random.default_rng(1)
    levels = [
        rng.normal(size=(1, 480 // s, 640 // s, 9)).astype(np.float32)
        for s in STRIDES
    ]
    b, s = decode_outputs([jnp.asarray(l) for l in levels], 4)
    assert b.shape == (1, 6300, 4)  # 60*80 + 30*40 + 15*20
    assert s.shape == (1, 6300, 4)


def test_rescale_matches_reference_semantics():
    # demo:1009-1012: x1 = int(max(0, x1) * W/w_in); x2 = int(min(x2,
    # w_in) * W/w_in); same for y with H/h_in. int() truncates.
    boxes = jnp.asarray([
        [-5.0, 10.0, 320.0, 480.0],    # x1 clamps at 0
        [100.5, 200.7, 700.0, 500.0],  # x2 clamps at in_w=640, y2 at 480
        [0.0, 0.0, 639.9, 479.9],
    ])
    out = np.asarray(_rescale_to_source(boxes, (480, 640), (1080, 1920)))
    sw, sh = 1920 / 640, 1080 / 480
    want = np.array([
        [int(0 * sw), int(10.0 * sh), int(320.0 * sw), int(480.0 * sh)],
        [int(100.5 * sw), int(200.7 * sh), int(640.0 * sw),
         int(480.0 * sh)],
        [int(0), int(0), int(639.9 * sw), int(479.9 * sh)],
    ], dtype=np.float64)
    np.testing.assert_allclose(out, want, atol=1e-3)
