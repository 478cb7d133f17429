"""Numpy oracle: looped IoU exactly as the reference evaluates it.

Mirrors bbox_iou / bbox_ious / iou_distance
(demo_bottrack_onnx_tflite.py:1695-1761): strict `<=` no-overlap rule,
float division, cost = 1 - IoU.
"""

import numpy as np


def iou_single(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    if ix2 <= ix1 or iy2 <= iy1:
        return 0.0
    inter = (ix2 - ix1) * (iy2 - iy1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / float(area_a + area_b - inter)


def iou_matrix(aboxes, bboxes):
    out = np.zeros((len(aboxes), len(bboxes)), dtype=np.float32)
    for i, a in enumerate(aboxes):
        for j, b in enumerate(bboxes):
            out[i, j] = iou_single(a, b)
    return out


def iou_distance(aboxes, bboxes):
    return 1.0 - iou_matrix(aboxes, bboxes)
