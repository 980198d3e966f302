"""GSUKF tests: sigma-point geometry, numpy-mirror parity of the update
math, Kalman-consistency, and the jit-vs-eager determinism check that
replaces the reference's CPU<->GPU parity test
(/root/reference/tests/GSUKF_test.py:48-99 — trivial under JAX since one
code path serves both backends).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_se_tpu.distributions import GaussianSum
from gpu_se_tpu.filters import GaussianSumUnscentedKalmanFilter
from gpu_se_tpu.filters import gs_ukf


def toy_parts():
    def f(x, u, dt):
        return jnp.stack([x[0] + u[0] * dt, x[1] * jnp.exp(-u[1]) * dt]) - x + x  # delta-ish

    def f_delta(x, u, dt):
        return jnp.stack([u[0] * dt, (jnp.exp(-u[1]) - 1.0) * x[1] * dt])

    def g(x, u):
        return jnp.stack([x[0] * x[1]])

    x0 = GaussianSum.create(
        means=np.array([[1.0, 10.0], [1.5, 11.0]]),
        covariances=np.stack([np.eye(2) * 0.1, np.eye(2) * 0.2]),
        weights=np.array([0.3, 0.7]),
    )
    state_pdf = GaussianSum.create(
        means=np.zeros((2, 2)),
        covariances=np.stack([np.eye(2) * 1e-4, np.eye(2) * 1e-3]),
        weights=np.array([0.6, 0.4]),
    )
    measurement_pdf = GaussianSum.create(
        means=np.array([[0.0]]),
        covariances=np.array([[[0.5]]]),
        weights=np.array([1.0]),
    )
    return f_delta, g, x0, state_pdf, measurement_pdf


def test_sigma_weights_properties():
    for nx in (1, 2, 5, 8):
        w = np.asarray(gs_ukf.sigma_weights(nx))
        assert w.shape == (2 * nx + 1,)
        # w_mu + 2*nx*w_sigma = 1 (cf. /root/reference/filter/gs_ukf.py:63-67)
        assert w.sum() == pytest.approx(1.0, rel=1e-6)
        # w_mu / w_sigma = 1.6
        assert w[0] / w[1] == pytest.approx(1.6, rel=1e-5)
        assert np.allclose(w[1:], w[1])


def test_sigma_points_geometry():
    key = jax.random.PRNGKey(0)
    n, nx = 8, 3
    means = jax.random.normal(key, (n, nx))
    a = jax.random.normal(jax.random.PRNGKey(1), (n, nx, nx))
    covs = a @ jnp.swapaxes(a, -1, -2) + 0.5 * jnp.eye(nx)
    state = gs_ukf.GSUKFState(means=means, covariances=covs,
                              weights=jnp.ones(n) / n, key=key)
    sigmas = gs_ukf.get_sigma_points(state)
    assert sigmas.shape == (n, 2 * nx + 1, nx)
    # first point is the mean; the +/- pairs average back to the mean
    np.testing.assert_allclose(np.asarray(sigmas[:, 0]), np.asarray(means), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray((sigmas[:, 1 : nx + 1] + sigmas[:, nx + 1 :]) / 2),
        np.broadcast_to(np.asarray(means)[:, None, :], (n, nx, nx)),
        rtol=1e-4, atol=1e-5,
    )
    # spread reconstructs the covariance: sum_j (s_j - mu)(s_j - mu)^T = 2 cov
    centered = np.asarray(sigmas - means[:, None, :])
    recon = np.einsum("nsx,nsy->nxy", centered, centered)
    np.testing.assert_allclose(recon, 2 * np.asarray(covs), rtol=1e-3, atol=1e-4)


def test_cholesky_jitter_fallback():
    # a singular covariance must not produce NaNs
    covs = jnp.zeros((2, 3, 3))
    out = gs_ukf._batched_cholesky_jittered(covs)
    assert bool(jnp.isfinite(out).all())


def test_api_smoke():
    f, g, x0, state_pdf, measurement_pdf = toy_parts()
    gsf = GaussianSumUnscentedKalmanFilter(f, g, 32, x0, state_pdf, measurement_pdf, seed=1)
    u = np.array([0.1, 0.2])
    gsf.predict(u, 0.1)
    gsf.update(u, np.array([10.0]))
    gsf.resample()
    est = np.asarray(gsf.point_estimate())
    assert est.shape == (2,)
    assert np.isfinite(est).all()
    assert float(gsf.point_covariance()) > 0
    assert gsf.means.shape == (32, 2)
    assert gsf.covariances.shape == (32, 2, 2)


def test_update_matches_numpy_mirror():
    """Re-derive the local UKF update in numpy for one bank entry."""
    f, g, x0, state_pdf, measurement_pdf = toy_parts()
    gsf = GaussianSumUnscentedKalmanFilter(f, g, 4, x0, state_pdf, measurement_pdf, seed=2)
    u, z = np.array([0.1, 0.2]), np.array([10.5])

    means0 = np.asarray(gsf.means, dtype=np.float64)
    covs0 = np.asarray(gsf.covariances, dtype=np.float64)
    w0 = np.asarray(gsf.weights, dtype=np.float64)
    nx = 2
    w_sigma = np.asarray(gs_ukf.sigma_weights(nx), dtype=np.float64)

    gsf.update(u, z)

    for i in range(4):
        L = np.linalg.cholesky(covs0[i]).T
        sig = np.vstack([means0[i][None], means0[i] + L, means0[i] - L])
        etas = np.stack([np.asarray(g(jnp.asarray(s), jnp.asarray(u))) for s in sig])
        eta_mean = w_sigma @ etas
        sc = sig - means0[i]
        ec = etas - eta_mean
        p_xy = sc.T @ (ec * w_sigma[:, None])
        p_yy = ec.T @ (ec * w_sigma[:, None])
        K = p_xy @ np.linalg.inv(p_yy)
        mean_new = means0[i] + K @ (z - eta_mean)
        cov_new = covs0[i] - K @ p_yy @ K.T
        np.testing.assert_allclose(np.asarray(gsf.means)[i], mean_new, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(gsf.covariances)[i], cov_new, rtol=1e-2, atol=1e-5
        )
        y_mean = np.asarray(g(jnp.asarray(mean_new), jnp.asarray(u)))
        expected_w = w0[i] * float(measurement_pdf.pdf(jnp.asarray(z - y_mean))[0])
        assert np.asarray(gsf.weights)[i] == pytest.approx(expected_w, rel=1e-2, abs=1e-12)


def test_update_contracts_local_covariances():
    """The Kalman update subtracts the PSD term K P_yy K^T, so every
    bank covariance trace must be non-increasing."""
    f, g, x0, state_pdf, measurement_pdf = toy_parts()
    gsf = GaussianSumUnscentedKalmanFilter(f, g, 16, x0, state_pdf, measurement_pdf, seed=3)
    tr_before = np.trace(np.asarray(gsf.covariances), axis1=1, axis2=2)
    gsf.update(np.array([0.1, 0.2]), np.array([11.0]))
    tr_after = np.trace(np.asarray(gsf.covariances), axis1=1, axis2=2)
    assert np.all(tr_after <= tr_before + 1e-6)
    assert tr_after.mean() < tr_before.mean()


def test_fused_step_equals_composition():
    f, g, x0, state_pdf, measurement_pdf = toy_parts()
    a = GaussianSumUnscentedKalmanFilter(f, g, 16, x0, state_pdf, measurement_pdf, seed=5)
    b = GaussianSumUnscentedKalmanFilter(f, g, 16, x0, state_pdf, measurement_pdf, seed=5)
    u, z, dt = np.array([0.1, 0.2]), np.array([10.0]), 0.1
    a.predict(u, dt); a.update(u, z); a.resample()
    b.step(u, z, dt)
    np.testing.assert_allclose(np.asarray(a.means), np.asarray(b.means), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a.covariances), np.asarray(b.covariances), rtol=1e-4, atol=1e-6
    )


def test_linear_update_reference_semantics():
    """Reference-quirk pin: the local UKF update builds P_yy purely from
    the propagated sigma spread — measurement noise R is NOT added
    (cf. /root/reference/filter/gs_ukf.py:131; noise enters only through
    the global weight pdf). For a linear g this makes K exactly 1, so the
    mean jumps to z and the covariance contracts by the sigma-weight
    factor 2*nx*w_sigma = 2/(2+8/5) for nx=1."""
    def f(x, u, dt):
        return jnp.stack([0.0 * x[0]])

    def g(x, u):
        return jnp.stack([x[0]])

    P0, r_var = 1.0, 0.1
    x0 = GaussianSum.create(np.array([[2.0]]), np.array([[[1e-12]]]), np.array([1.0]))
    state_pdf = GaussianSum.create(np.array([[0.0]]), np.array([[[P0]]]), np.array([1.0]))
    meas_pdf = GaussianSum.create(np.array([[0.0]]), np.array([[[r_var]]]), np.array([1.0]))
    gsf = GaussianSumUnscentedKalmanFilter(f, g, 1, x0, state_pdf, meas_pdf, seed=0)
    z = 3.0
    gsf.update(np.array([0.0]), np.array([z]))
    assert float(gsf.means[0, 0]) == pytest.approx(z, rel=1e-5)
    spread = 2.0 / (2.0 + 8.0 / 5.0)  # 2 * nx * w_sigma for nx = 1
    assert float(gsf.covariances[0, 0, 0]) == pytest.approx((1 - spread) * P0, rel=1e-3)


def test_update_survives_collapsed_component():
    """VERDICT r3 weak #7: a bank component with a collapsed (singular)
    covariance must not poison the update with inf/NaN means — the
    jittered gain solve mirrors the reference CPU path's pinv
    (/root/reference/filter/gs_ukf.py:134)."""
    import numpy as np
    from gpu_se_tpu.filters import gs_ukf
    from gpu_se_tpu.ops.smallmat import inv_small, inv_small_jittered

    # direct op check: singular 2x2 -> finite jittered inverse
    sing = jnp.array([[[1.0, 1.0], [1.0, 1.0]],      # rank 1
                      [[0.0, 0.0], [0.0, 0.0]],      # rank 0
                      [[2.0, 0.0], [0.0, 3.0]]])     # healthy
    raw = inv_small(sing)
    assert not np.isfinite(np.asarray(raw)).all()    # the hazard is real
    fixed = inv_small_jittered(sing)
    assert np.isfinite(np.asarray(fixed)).all()
    # the healthy matrix is untouched (branchless where keeps exact path)
    np.testing.assert_allclose(
        np.asarray(fixed[2]), np.asarray(raw[2]), rtol=0, atol=0
    )

    # end-to-end: collapse one component's covariance to zero so its
    # sigma points coincide and P_yy is singular for that component
    f, g, x0, state_pdf, measurement_pdf = toy_parts()
    state = gs_ukf.init(jax.random.PRNGKey(3), 4, x0, state_pdf)
    covs = state.covariances.at[0].set(jnp.zeros_like(state.covariances[0]))
    state = state.replace(covariances=covs)
    u, z = jnp.asarray([0.1, 0.2]), jnp.asarray([10.5])
    new = gs_ukf.update(state, u, z, g, measurement_pdf)
    assert np.isfinite(np.asarray(new.means)).all()
    assert np.isfinite(np.asarray(new.covariances)).all()


def test_lanes_smallmat_mirrors_batched_exactly():
    """The lanes-last small-matrix ops (round-4 GSUKF layout fix) are
    op-for-op mirrors of the batched ones — bitwise equal."""
    import numpy as np
    from gpu_se_tpu.ops.smallmat import (
        cholesky_small, cholesky_small_lanes,
        inv_small, inv_small_lanes, inv_small_jittered_lanes,
    )

    rng = np.random.default_rng(0)
    a = rng.standard_normal((64, 5, 5)).astype(np.float32)
    spd = a @ np.swapaxes(a, 1, 2) + 3 * np.eye(5, dtype=np.float32)
    l1 = np.asarray(cholesky_small(jnp.asarray(spd)))
    l2 = np.asarray(cholesky_small_lanes(jnp.asarray(spd.transpose(1, 2, 0))))
    np.testing.assert_array_equal(l1, l2.transpose(2, 0, 1))

    m2 = rng.standard_normal((64, 2, 2)).astype(np.float32)
    m2 = m2 @ np.swapaxes(m2, 1, 2) + np.eye(2, dtype=np.float32)
    i1 = np.asarray(inv_small(jnp.asarray(m2)))
    i2 = np.asarray(inv_small_lanes(jnp.asarray(m2.transpose(1, 2, 0))))
    np.testing.assert_array_equal(i1, i2.transpose(2, 0, 1))
    j2 = np.asarray(inv_small_jittered_lanes(jnp.asarray(m2.transpose(1, 2, 0))))
    np.testing.assert_array_equal(i2, j2)

    sing = np.zeros((3, 2, 2), np.float32)
    sing[0] = [[1, 1], [1, 1]]
    js = np.asarray(inv_small_jittered_lanes(jnp.asarray(sing.transpose(1, 2, 0))))
    assert np.isfinite(js).all()


def test_inv_small_lanes_general_n():
    """ny >= 3 models must not crash (ADVICE r4 medium #1): the lanes
    inverse round-trips through the batched layout for n >= 3."""
    import numpy as np
    from gpu_se_tpu.ops.smallmat import inv_small_lanes, inv_small_jittered_lanes

    rng = np.random.default_rng(1)
    for n in (3, 4):
        m = rng.standard_normal((32, n, n)).astype(np.float32)
        m = m @ np.swapaxes(m, 1, 2) + n * np.eye(n, dtype=np.float32)
        inv = np.asarray(inv_small_lanes(jnp.asarray(m.transpose(1, 2, 0))))
        inv = inv.transpose(2, 0, 1)
        np.testing.assert_allclose(
            inv @ m, np.broadcast_to(np.eye(n), (32, n, n)), atol=2e-4)
        invj = np.asarray(
            inv_small_jittered_lanes(jnp.asarray(m.transpose(1, 2, 0)))
        ).transpose(2, 0, 1)
        np.testing.assert_array_equal(inv, invj)


def test_update_stabilized_matches_update_moments():
    """update_stabilized (single update_core pass, round-5 refactor)
    produces the same means/covs as update and normalized log-space
    weights proportional to update's linear weights."""
    f, g, x0, state_pdf, measurement_pdf = toy_parts()
    gsf = GaussianSumUnscentedKalmanFilter(
        f, g, 16, x0, state_pdf, measurement_pdf, seed=7)
    state = gsf.state
    u, z = jnp.array([0.1, 0.2]), jnp.array([10.5])
    lin = gs_ukf.update(state, u, z, g, measurement_pdf)
    stab = gs_ukf.update_stabilized(state, u, z, g, measurement_pdf)
    np.testing.assert_array_equal(np.asarray(lin.means), np.asarray(stab.means))
    np.testing.assert_array_equal(
        np.asarray(lin.covariances), np.asarray(stab.covariances))
    wl = np.asarray(lin.weights, dtype=np.float64)
    wl = wl / wl.sum()
    np.testing.assert_allclose(wl, np.asarray(stab.weights), rtol=2e-4, atol=1e-7)
