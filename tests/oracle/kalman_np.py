"""Numpy oracle: full 8x8 Kalman equations as the reference computes them.

State: (cx, cy, w, h, vcx, vcy, vw, vh); F = [[I,I],[0,I]]; H = [I 0];
Q = diag((wp*[w,h,w,h])^2, (wv*[w,h,w,h])^2) at the pre-predict mean;
R = diag((wp*[w,h,w,h])^2) at the post-predict mean;
init stds: pos 2*wp*[w,h,w,h], vel 10*wv*[w,h,w,h]
(demo_bottrack_onnx_tflite.py:151-336; reimplemented from the equations).
"""

import numpy as np

WP = 1.0 / 20
WV = 1.0 / 160

F = np.eye(8)
F[:4, 4:] = np.eye(4)
H = np.eye(4, 8)


def _scales(mean4):
    w, h = mean4[2], mean4[3]
    return np.array([w, h, w, h])


def initiate(z):
    mean = np.concatenate([z, np.zeros(4)])
    std = np.concatenate([2 * WP * _scales(z), 10 * WV * _scales(z)])
    return mean, np.diag(std**2)


def predict(mean, cov):
    s = _scales(mean)
    q = np.diag(np.concatenate([(WP * s) ** 2, (WV * s) ** 2]))
    return F @ mean, F @ cov @ F.T + q


def project(mean, cov):
    s = _scales(mean)
    r = np.diag((WP * s) ** 2)
    return H @ mean, H @ cov @ H.T + r


def update(mean, cov, z):
    zp, s_mat = project(mean, cov)
    gain = np.linalg.solve(s_mat.T, (cov @ H.T).T).T
    innov = z - zp
    new_mean = mean + gain @ innov
    new_cov = cov - gain @ s_mat @ gain.T
    return new_mean, new_cov


def gating_distance(mean, cov, measurements, only_position=False):
    zp, s_mat = project(mean, cov)
    if only_position:
        zp, s_mat = zp[:2], s_mat[:2, :2]
        measurements = measurements[:, :2]
    d = measurements - zp
    sol = np.linalg.solve(s_mat, d.T)
    return np.sum(d.T * sol, axis=0)
