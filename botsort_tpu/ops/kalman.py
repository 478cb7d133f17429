"""Batched constant-velocity Kalman filter over fixed track slots.

TPU-first redesign of the reference ``KalmanFilter``
(demo_bottrack_onnx_tflite.py:118-380), which keeps a dense 8x8 covariance
per track and factorizes a 4x4 innovation covariance with LAPACK Cholesky on
every update (demo:326-330).

Key observation: in the reference's model the four measured coordinates
(cx, cy, w, h) never couple. The motion matrix F = [[I4, I4], [0, I4]],
process noise Q, observation H = [I4 0] and measurement noise R are all
block-diagonal with respect to the (position_i, velocity_i) pairs, and
``initiate`` produces a diagonal covariance — so the 8x8 covariance is
permutation-similar to four independent 2x2 blocks for the entire life of a
track. (The only reference op that would break this, ``multi_gmc`` camera
rotation, is dead code — its call sites are commented out at demo:1534-1536.)

We therefore store, per track and per coordinate i in (cx, cy, w, h):

    mean:  pos_i, vel_i                        -> mean [N, 8] (pos 0:4, vel 4:8)
    cov:   (a, b, c) = (P_pp, P_pv, P_vv)_i    -> cov  [N, 4, 3]

and every KF step becomes closed-form elementwise arithmetic — no matrix
algebra, no factorizations, pure VPU work across all N slots at once. The
oracle tests (tests/test_kalman.py) verify bit-level agreement with a fresh
numpy implementation of the reference's full 8x8 equations.

Noise scales (demo:163-164): std_pos_weight = 1/20, std_vel_weight = 1/160,
each multiplied by the track's current w (for x, w) or h (for y, h).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

STD_WEIGHT_POSITION = 1.0 / 20
STD_WEIGHT_VELOCITY = 1.0 / 160

# chi-square 0.95 quantiles for N=1..9 dof (demo:139-149); used by the
# optional Mahalanobis gate (the reference defines but never calls it —
# demo:338-380 is dead code; we expose a working batched version).
# Plain tuple: a module-level jnp array would initialize the JAX backend
# at import time, before callers can select a platform.
CHI2INV95 = (3.8415, 5.9915, 7.8147, 9.4877, 11.070, 12.592, 14.067,
             15.507, 16.919)


def _noise_scales(wh: jnp.ndarray) -> jnp.ndarray:
    """Per-coordinate noise scale: (w, h, w, h) for (cx, cy, w, h).

    wh: [..., 2] -> [..., 4].
    """
    w = wh[..., 0]
    h = wh[..., 1]
    return jnp.stack([w, h, w, h], axis=-1)


def initiate(measurement_xywh: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Create track state from measurements. [..., 4] -> ([..., 8], [..., 4, 3]).

    Mirrors demo:166-197: position stds 2*w_p*scale, velocity stds
    10*w_v*scale, velocities zero, covariance diagonal.
    """
    pos = measurement_xywh
    vel = jnp.zeros_like(pos)
    mean = jnp.concatenate([pos, vel], axis=-1)

    s = _noise_scales(measurement_xywh[..., 2:4])
    std_p = 2.0 * STD_WEIGHT_POSITION * s
    std_v = 10.0 * STD_WEIGHT_VELOCITY * s
    a = std_p * std_p
    c = std_v * std_v
    b = jnp.zeros_like(a)
    cov = jnp.stack([a, b, c], axis=-1)
    return mean, cov


def predict(
    mean: jnp.ndarray, cov: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched predict step. mean [..., 8], cov [..., 4, 3].

    Per coordinate: p' = p + v, v' = v,
      a' = a + 2b + c + q_p,  b' = b + c,  c' = c + q_v
    with q_p = (w_p * s)^2, q_v = (w_v * s)^2 evaluated at the *previous*
    mean's (w, h) — exactly the reference's ``multi_predict`` (demo:265-302).
    """
    pos = mean[..., :4]
    vel = mean[..., 4:8]
    new_mean = jnp.concatenate([pos + vel, vel], axis=-1)

    s = _noise_scales(mean[..., 2:4])
    q_p = jnp.square(STD_WEIGHT_POSITION * s)
    q_v = jnp.square(STD_WEIGHT_VELOCITY * s)

    a = cov[..., 0]
    b = cov[..., 1]
    c = cov[..., 2]
    new_cov = jnp.stack(
        [a + 2.0 * b + c + q_p, b + c, c + q_v], axis=-1
    )
    return new_mean, new_cov


def project(
    mean: jnp.ndarray, cov: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project to measurement space: returns (measurement mean [...,4],
    innovation variance S [...,4]) — S is diagonal in the scalar form.

    Mirrors demo:236-263 with R = diag((w_p * s)^2) at the current mean.
    """
    s = _noise_scales(mean[..., 2:4])
    r = jnp.square(STD_WEIGHT_POSITION * s)
    return mean[..., :4], cov[..., 0] + r


def update(
    mean: jnp.ndarray, cov: jnp.ndarray, measurement_xywh: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched correction step (demo:304-336), closed form.

    K_p = a/S, K_v = b/S;  p+ = p + K_p e, v+ = v + K_v e (e = z - p)
    a+ = a - a^2/S,  b+ = b - a*b/S,  c+ = c - b^2/S.
    """
    z_pred, s_innov = project(mean, cov)
    e = measurement_xywh - z_pred

    a = cov[..., 0]
    b = cov[..., 1]
    c = cov[..., 2]
    # S == 0 only for a fully degenerate track (w == h == 0, e.g. a
    # zero-area detection surviving the int-truncating rescale); the
    # reference's Cholesky would fail on that same input. Guard so
    # 0 * (1/0) cannot make NaN gains — with a, b also 0 the guarded
    # update is an exact no-op.
    inv_s = 1.0 / jnp.maximum(s_innov, 1e-12)
    k_p = a * inv_s
    k_v = b * inv_s

    new_pos = mean[..., :4] + k_p * e
    new_vel = mean[..., 4:8] + k_v * e
    new_mean = jnp.concatenate([new_pos, new_vel], axis=-1)

    new_cov = jnp.stack(
        [a - a * a * inv_s, b - a * b * inv_s, c - b * b * inv_s], axis=-1
    )
    return new_mean, new_cov


def gating_distance(
    mean: jnp.ndarray,
    cov: jnp.ndarray,
    measurements_xywh: jnp.ndarray,
    only_position: bool = False,
) -> jnp.ndarray:
    """Squared Mahalanobis distance from one track to M measurements.

    mean [..., 8], cov [..., 4, 3], measurements [..., M, 4] -> [..., M].
    Diagonal S makes this a weighted squared error (demo:338-380 equivalent
    for block-diagonal covariances).
    """
    z_pred, s_innov = project(mean, cov)
    d = measurements_xywh - z_pred[..., None, :]
    w = 1.0 / jnp.maximum(s_innov[..., None, :], 1e-12)
    n = 2 if only_position else 4
    return jnp.sum(d[..., :n] * d[..., :n] * w[..., :n], axis=-1)


def apply_affine(
    mean: jnp.ndarray, cov: jnp.ndarray, affine_2x3: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-motion compensation: apply a 2x3 affine to track states.

    Equivalent of the reference's ``multi_gmc`` (demo:538-554: mean' =
    kron(I4, R) mean + t; cov' = R8 cov R8^T) for the scalar-form store.
    The MEAN transforms exactly as the reference's: R is applied to all
    four state pairs — including (w, h), which the reference rotates as
    if it were a vector (upstream BoT-SORT does the same; at GMC's
    <~1 deg inter-frame rotations the w/h mixing is O(sin theta) and
    harmless, and for pure similarity transforms it reduces to the
    natural s-scaling). For the COVARIANCE, the similarity scale
    s = |det R|^(1/2) is applied exactly (s^2 per block); the rotation
    part mixes the x/y blocks, which the independent-pairs form cannot
    represent — the dropped mixing terms are O(sin^2 theta), bound
    quantified in tests/test_gmc.py::test_apply_affine_rotation_error_bound.
    mean [..., 8], cov [..., 4, 3].
    """
    r = affine_2x3[:, :2]
    t = affine_2x3[:, 2]
    s = jnp.sqrt(jnp.abs(r[0, 0] * r[1, 1] - r[0, 1] * r[1, 0]))

    pos_xy = mean[..., 0:2] @ r.T + t
    wh = mean[..., 2:4] @ r.T
    vel_xy = mean[..., 4:6] @ r.T
    vwh = mean[..., 6:8] @ r.T
    new_mean = jnp.concatenate([pos_xy, wh, vel_xy, vwh], axis=-1)
    new_cov = cov * (s * s)
    return new_mean, new_cov


def cov_to_dense(cov: jnp.ndarray) -> jnp.ndarray:
    """Expand scalar-form covariance [..., 4, 3] to dense [..., 8, 8].

    For interop/debugging and for checkpoint export in the reference's
    layout (state order cx, cy, w, h, vcx, vcy, vw, vh).
    """
    batch = cov.shape[:-2]
    dense = jnp.zeros(batch + (8, 8), dtype=cov.dtype)
    idx = jnp.arange(4)
    dense = dense.at[..., idx, idx].set(cov[..., 0])
    dense = dense.at[..., idx, idx + 4].set(cov[..., 1])
    dense = dense.at[..., idx + 4, idx].set(cov[..., 1])
    dense = dense.at[..., idx + 4, idx + 4].set(cov[..., 2])
    return dense


def cov_from_dense(dense: jnp.ndarray) -> jnp.ndarray:
    """Extract scalar-form covariance from a dense 8x8 (assumes block-diag)."""
    idx = jnp.arange(4)
    return jnp.stack(
        [
            dense[..., idx, idx],
            dense[..., idx, idx + 4],
            dense[..., idx + 4, idx + 4],
        ],
        axis=-1,
    )
