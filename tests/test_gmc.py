"""Camera-motion compensation: state transform math + estimator + e2e."""

import numpy as np
import cv2
import jax.numpy as jnp

from botsort_tpu.config import TrackerConfig
from botsort_tpu.io.gmc import GMCEstimator
from botsort_tpu.ops import kalman
from botsort_tpu.track.cascade import tracker_update
from botsort_tpu.track.state import empty_store


def dense_gmc(mean8, cov8, h):
    """Reference multi_gmc math (demo:538-554) on dense 8x8 state."""
    r = h[:2, :2]
    r8 = np.kron(np.eye(4), r)
    m = r8 @ mean8
    m[:2] += h[:2, 2]
    return m, r8 @ cov8 @ r8.T


def test_apply_affine_translation_exact():
    rng = np.random.default_rng(0)
    z = np.array([100.0, 50.0, 40.0, 80.0], np.float32)
    mean, cov = kalman.initiate(jnp.asarray(z[None]))
    mean, cov = kalman.predict(mean, cov)
    h = np.array([[1, 0, 12.5], [0, 1, -7.0]], np.float32)
    got_m, got_c = kalman.apply_affine(mean, cov, jnp.asarray(h))

    # Dense reference on the same state.
    ref_m, ref_c = dense_gmc(
        np.asarray(mean)[0].astype(np.float64),
        np.asarray(kalman.cov_to_dense(cov))[0].astype(np.float64), h)
    np.testing.assert_allclose(np.asarray(got_m)[0], ref_m, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(kalman.cov_to_dense(got_c))[0], ref_c, rtol=1e-5)


def test_apply_affine_scale():
    z = np.array([100.0, 50.0, 40.0, 80.0], np.float32)
    mean, cov = kalman.initiate(jnp.asarray(z[None]))
    h = np.array([[1.1, 0, 0], [0, 1.1, 0]], np.float32)
    got_m, got_c = kalman.apply_affine(mean, cov, jnp.asarray(h))
    ref_m, ref_c = dense_gmc(
        np.asarray(mean)[0].astype(np.float64),
        np.asarray(kalman.cov_to_dense(cov))[0].astype(np.float64), h)
    np.testing.assert_allclose(np.asarray(got_m)[0], ref_m, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(kalman.cov_to_dense(got_c))[0], ref_c, rtol=1e-4)


def test_estimator_recovers_translation():
    rng = np.random.default_rng(1)
    base = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
    base = cv2.GaussianBlur(base, (5, 5), 0)
    est = GMCEstimator(downscale=1)
    h0 = est.estimate(base)
    np.testing.assert_allclose(h0, np.eye(2, 3), atol=1e-6)
    shifted = np.roll(base, shift=(0, 8), axis=(0, 1))
    h1 = est.estimate(shifted)
    assert abs(h1[0, 2] - 8.0) < 1.5, h1
    assert abs(h1[1, 2]) < 1.5, h1


def test_estimator_recovers_rotation_zoom():
    """A rotating + zooming camera (not just the panning case): the
    estimator must recover the full partial-affine (R, s, t), since
    apply_affine consumes all of it. Uses a full-res (downscale=1)
    warpAffine'd textured scene; tolerances cover LK/RANSAC noise."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (360, 480, 3), dtype=np.uint8)
    base = cv2.GaussianBlur(base, (7, 7), 0)
    est = GMCEstimator(downscale=1)
    est.estimate(base)

    angle_deg, scale = 2.0, 1.03
    h_true = cv2.getRotationMatrix2D((240.0, 180.0), angle_deg, scale)
    warped = cv2.warpAffine(base, h_true, (480, 360),
                            flags=cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_REFLECT)
    h = est.estimate(warped)

    # Recovered linear part: rotation angle and isotropic scale.
    got_scale = np.sqrt(abs(np.linalg.det(h[:, :2])))
    got_angle = np.degrees(np.arctan2(h[1, 0], h[0, 0]))
    want_angle = np.degrees(np.arctan2(h_true[1, 0], h_true[0, 0]))
    assert abs(got_scale - scale) < 0.01, h
    assert abs(got_angle - want_angle) < 0.3, (got_angle, want_angle)
    # Translation: compare the full map at the frame centre.
    c = np.array([240.0, 180.0, 1.0])
    err = (h @ c) - (h_true @ c)
    assert np.linalg.norm(err) < 2.0, err


def test_apply_affine_rotation_error_bound():
    """Quantify the 2x2-block covariance approximation under rotational
    GMC (ops/kalman.py::apply_affine drops the O(sin^2 theta) x/y
    mixing terms; the mean transforms exactly).

    The dropped diagonal-entry error scales as sin^2(theta) times the
    x/y block anisotropy (variance ratio, here (h/w)^2 = 4): at the
    <~1 deg inter-frame rotations real camera motion produces that is
    ~1e-3 relative; at an extreme 5 deg it is ~2%. Anything that widens
    GMC beyond this envelope (e.g. synthetic spin) must switch to a
    dense cov."""
    z = np.array([100.0, 50.0, 40.0, 80.0], np.float32)
    mean, cov = kalman.initiate(jnp.asarray(z[None]))
    mean, cov = kalman.predict(mean, cov)

    for angle_deg, rel_bound in [(1.0, 1.2e-3), (5.0, 3e-2)]:
        a = np.radians(angle_deg)
        h = np.array([[np.cos(a), -np.sin(a), 3.0],
                      [np.sin(a), np.cos(a), -2.0]], np.float32)
        got_m, got_c = kalman.apply_affine(mean, cov, jnp.asarray(h))
        ref_m, ref_c = dense_gmc(
            np.asarray(mean)[0].astype(np.float64),
            np.asarray(kalman.cov_to_dense(cov))[0].astype(np.float64),
            h)
        # Mean: exact vs the reference (kron(I4, R) applied to all four
        # pairs, including the reference's w/h rotation).
        np.testing.assert_allclose(np.asarray(got_m)[0], ref_m,
                                   rtol=1e-5)
        # Covariance diagonal: relative error bounded by ~sin^2(theta).
        got_d = np.diag(np.asarray(kalman.cov_to_dense(got_c))[0])
        ref_d = np.diag(ref_c)
        rel = np.max(np.abs(got_d - ref_d) / np.maximum(ref_d, 1e-12))
        assert rel < rel_bound, (angle_deg, rel)


def test_gmc_keeps_track_through_camera_pan():
    """A stationary object under a fast camera pan: with GMC the track
    follows via the compensated prediction; without it the IoU gate can
    break. Verifies the cascade's gmc path end-to-end."""
    cfg = TrackerConfig(max_tracks=8, max_dets=4, body_feature_dim=8,
                        face_feature_dim=8)
    rng = np.random.default_rng(2)
    feat = rng.normal(size=(8,)).astype(np.float32)
    feat /= np.linalg.norm(feat)
    ffeat = feat.copy()

    def dets_at(x):
        tlbr = np.zeros((4, 4), np.float32)
        tlbr[0] = [x, 50, x + 40, 130]
        score = np.array([0.95, 0, 0, 0], np.float32)
        valid = np.array([True, False, False, False])
        bf = np.zeros((4, 8), np.float32)
        bf[0] = feat
        ff = np.zeros((4, 8), np.float32)
        ff[0] = ffeat
        return (jnp.asarray(tlbr), jnp.asarray(score), jnp.asarray(valid),
                jnp.asarray(bf), jnp.asarray(ff))

    # Camera pans 35 px/frame: apparent x jumps each frame.
    pan = 35.0
    h = jnp.asarray([[1.0, 0.0, pan], [0.0, 1.0, 0.0]], jnp.float32)
    store = empty_store(cfg)
    x = 100.0
    ids = set()
    for t in range(8):
        gmc = None if t == 0 else h
        store, out = tracker_update(store, *dets_at(x), cfg, gmc)
        v = np.asarray(out.valid)
        ids.update(np.asarray(out.track_id)[v].tolist())
        x += pan
    assert ids == {1}, ids  # one stable identity through the pan
