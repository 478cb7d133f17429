"""Scalar-form batched KF vs the full 8x8 numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from botsort_tpu.ops import kalman
from tests.oracle import kalman_np


def random_measurements(rng, n):
    # Plausible (cx, cy, w, h) boxes in a 640x480 frame.
    cx = rng.uniform(0, 640, n)
    cy = rng.uniform(0, 480, n)
    w = rng.uniform(10, 200, n)
    h = rng.uniform(20, 300, n)
    return np.stack([cx, cy, w, h], axis=-1).astype(np.float32)


def test_initiate_matches_oracle():
    rng = np.random.default_rng(0)
    z = random_measurements(rng, 16)
    mean, cov = jax.jit(kalman.initiate)(jnp.asarray(z))
    dense = np.asarray(kalman.cov_to_dense(cov))
    for i in range(16):
        m_ref, p_ref = kalman_np.initiate(z[i].astype(np.float64))
        np.testing.assert_allclose(np.asarray(mean)[i], m_ref, rtol=1e-5)
        np.testing.assert_allclose(dense[i], p_ref, rtol=1e-5, atol=1e-8)


def test_predict_update_cycle_matches_oracle():
    rng = np.random.default_rng(1)
    n = 8
    z0 = random_measurements(rng, n)
    mean, cov = kalman.initiate(jnp.asarray(z0))
    ref = [kalman_np.initiate(z0[i].astype(np.float64)) for i in range(n)]

    predict_j = jax.jit(kalman.predict)
    update_j = jax.jit(kalman.update)

    for step in range(10):
        mean, cov = predict_j(mean, cov)
        ref = [kalman_np.predict(m, p) for m, p in ref]
        z = random_measurements(rng, n)
        mean, cov = update_j(mean, cov, jnp.asarray(z))
        ref = [
            kalman_np.update(m, p, z[i].astype(np.float64))
            for i, (m, p) in enumerate(ref)
        ]
        dense = np.asarray(kalman.cov_to_dense(cov))
        for i in range(n):
            np.testing.assert_allclose(
                np.asarray(mean)[i], ref[i][0], rtol=2e-4, atol=1e-3
            )
            np.testing.assert_allclose(
                dense[i], ref[i][1], rtol=2e-3, atol=1e-4
            )
            # The oracle's 8x8 covariance must stay block-diagonal (this is
            # the structural claim the scalar form relies on).
            p = ref[i][1]
            off = p.copy()
            idx = np.arange(4)
            off[idx, idx] = 0
            off[idx, idx + 4] = 0
            off[idx + 4, idx] = 0
            off[idx + 4, idx + 4] = 0
            assert np.abs(off).max() < 1e-9


def test_project_matches_oracle():
    rng = np.random.default_rng(2)
    z = random_measurements(rng, 4)
    mean, cov = kalman.initiate(jnp.asarray(z))
    mean, cov = kalman.predict(mean, cov)
    zp, s = jax.jit(kalman.project)(mean, cov)
    for i in range(4):
        m_ref, p_ref = kalman_np.initiate(z[i].astype(np.float64))
        m_ref, p_ref = kalman_np.predict(m_ref, p_ref)
        zp_ref, s_ref = kalman_np.project(m_ref, p_ref)
        np.testing.assert_allclose(np.asarray(zp)[i], zp_ref, rtol=1e-5)
        # Oracle S must be diagonal; compare against its diagonal.
        assert np.abs(s_ref - np.diag(np.diag(s_ref))).max() < 1e-9
        np.testing.assert_allclose(
            np.asarray(s)[i], np.diag(s_ref), rtol=1e-4
        )


def test_gating_distance_matches_oracle():
    rng = np.random.default_rng(3)
    z = random_measurements(rng, 1)[0]
    mean, cov = kalman.initiate(jnp.asarray(z))
    mean, cov = kalman.predict(mean, cov)
    meas = random_measurements(rng, 12)

    m_ref, p_ref = kalman_np.initiate(z.astype(np.float64))
    m_ref, p_ref = kalman_np.predict(m_ref, p_ref)

    for only_pos in (False, True):
        got = kalman.gating_distance(
            mean, cov, jnp.asarray(meas), only_position=only_pos
        )
        want = kalman_np.gating_distance(
            m_ref, p_ref, meas.astype(np.float64), only_position=only_pos
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4)


def test_nontracked_velocity_zeroing_convention():
    # The cascade zeroes vw, vh (state indices 6,7) for non-Tracked tracks
    # before predict (demo:529-532). Check the slicing convention we rely on.
    z = jnp.asarray([[100.0, 50.0, 20.0, 40.0]])
    mean, cov = kalman.initiate(z)
    mean = mean.at[:, 4:].set(jnp.asarray([[1.0, 2.0, 3.0, 4.0]]))
    zeroed = mean.at[:, 6:8].set(0.0)
    m2, _ = kalman.predict(zeroed, cov)
    np.testing.assert_allclose(
        np.asarray(m2)[0, :4], [101.0, 52.0, 20.0, 40.0], rtol=1e-6
    )


def test_update_degenerate_zero_size_is_finite():
    """A zero-area measurement (possible after the int-truncating
    rescale) must not produce NaN: S==0 is guarded so the update is an
    exact no-op on the degenerate coordinates (the reference's Cholesky
    would fail on this input; see ops/kalman.py::update)."""
    import jax.numpy as jnp

    from botsort_tpu.ops import kalman

    z = jnp.zeros((1, 4), jnp.float32)
    mean, cov = kalman.initiate(z)
    mean, cov = kalman.predict(mean, cov)
    mean2, cov2 = kalman.update(mean, cov, z)
    assert bool(jnp.isfinite(mean2).all())
    assert bool(jnp.isfinite(cov2).all())
    import numpy as np

    np.testing.assert_allclose(np.asarray(mean2), np.asarray(mean))
