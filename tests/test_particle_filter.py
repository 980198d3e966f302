"""Particle-filter tests: smoke (reference parity of API), numpy-mirror
parity of each step, and statistical correctness against a Kalman filter
on a linear-Gaussian system — a stronger check than the reference's
assertion-free smoke test (/root/reference/tests/ParticleFilter_test.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_se_tpu.distributions import GaussianSum
from gpu_se_tpu.filters import ParticleFilter
from gpu_se_tpu.filters import particle as pf
from gpu_se_tpu.models import bioreactor as bio


def toy_parts(n=512, seed=0):
    """Toy 2-state setup mirroring /root/reference/tests/ParticleFilter_test.py:9-61."""

    def f(x, u, dt):
        return jnp.stack([x[0] + u[0] * dt, x[1] * jnp.exp(-u[1]) * dt])

    def g(x, u):
        return jnp.stack([x[0] * x[1]])

    x0 = GaussianSum.create(
        means=np.array([[1.0, 10.0], [1.5, 11.0]]),
        covariances=np.stack([np.eye(2) * 0.1, np.eye(2) * 0.2]),
        weights=np.array([0.3, 0.7]),
    )
    state_pdf = GaussianSum.create(
        means=np.array([[0.0, 0.0], [0.1, -0.1]]),
        covariances=np.stack([np.eye(2) * 1e-3, np.eye(2) * 1e-2]),
        weights=np.array([0.6, 0.4]),
    )
    measurement_pdf = GaussianSum.create(
        means=np.array([[0.0]]),
        covariances=np.array([[[1.0]]]),
        weights=np.array([1.0]),
    )
    return f, g, x0, state_pdf, measurement_pdf


def test_api_smoke():
    f, g, x0, state_pdf, measurement_pdf = toy_parts()
    p = ParticleFilter(f, g, 256, x0, state_pdf, measurement_pdf, seed=1)
    p.predict(np.array([0.1, 0.2]), 0.1)
    p.update(np.array([0.1, 0.2]), np.array([10.0]))
    p.resample()
    est = np.asarray(p.point_estimate())
    cov = float(p.point_covariance())
    assert est.shape == (2,)
    assert np.isfinite(est).all()
    assert cov > 0
    assert p.particles.shape == (256, 2)
    np.testing.assert_allclose(np.asarray(p.weights), 1.0 / 256)


def test_predict_matches_numpy_mirror():
    f, g, x0, state_pdf, measurement_pdf = toy_parts()
    p = ParticleFilter(f, g, 64, x0, state_pdf, measurement_pdf, seed=3)
    state0 = p.state
    u, dt = np.array([0.1, 0.2]), 0.5

    # numpy mirror with the identical key-split sequence
    key, sub = jax.random.split(state0.key)
    noise = np.asarray(state_pdf.draw(sub, (64,)))
    parts = np.asarray(state0.particles)
    deltas = np.stack([np.asarray(f(jnp.asarray(x), jnp.asarray(u), dt)) for x in parts])
    expected = parts + deltas + noise

    p.predict(u, dt)
    np.testing.assert_allclose(np.asarray(p.particles), expected, rtol=1e-6, atol=1e-6)


def test_update_matches_numpy_mirror():
    f, g, x0, state_pdf, measurement_pdf = toy_parts()
    p = ParticleFilter(f, g, 64, x0, state_pdf, measurement_pdf, seed=4)
    u, z = np.array([0.1, 0.2]), np.array([10.0])
    parts = np.asarray(p.particles)
    w0 = np.asarray(p.weights)
    ys = np.stack([np.asarray(g(jnp.asarray(x), jnp.asarray(u))) for x in parts])
    pdf_vals = np.asarray(measurement_pdf.pdf(jnp.asarray(z - ys)))
    p.update(u, z)
    # far-tail pdf values underflow toward float32 denormals; compare with
    # an absolute floor well below any weight that matters
    np.testing.assert_allclose(np.asarray(p.weights), w0 * pdf_vals, rtol=1e-4, atol=1e-12)


def test_fused_step_equals_composition():
    f, g, x0, state_pdf, measurement_pdf = toy_parts()
    a = ParticleFilter(f, g, 128, x0, state_pdf, measurement_pdf, seed=5)
    b = ParticleFilter(f, g, 128, x0, state_pdf, measurement_pdf, seed=5)
    u, z, dt = np.array([0.1, 0.2]), np.array([10.0]), 0.1
    a.predict(u, dt); a.update(u, z); a.resample()
    b.step(u, z, dt)
    np.testing.assert_allclose(
        np.asarray(a.particles), np.asarray(b.particles), rtol=1e-6
    )


def test_linear_gaussian_tracks_kalman():
    """PF posterior mean ~= Kalman filter on a 1D linear-Gaussian system."""
    a_coef, q, r_var = 0.9, 0.05, 0.1

    def f(x, u, dt):
        return jnp.stack([(a_coef - 1.0) * x[0]])  # delta convention

    def g(x, u):
        return jnp.stack([x[0]])

    x0 = GaussianSum.create(np.array([[0.0]]), np.array([[[1.0]]]), np.array([1.0]))
    state_pdf = GaussianSum.create(np.array([[0.0]]), np.array([[[q]]]), np.array([1.0]))
    meas_pdf = GaussianSum.create(np.array([[0.0]]), np.array([[[r_var]]]), np.array([1.0]))

    p = ParticleFilter(f, g, 2**14, x0, state_pdf, meas_pdf, seed=0)

    rng = np.random.default_rng(0)
    x_true = 1.5
    # Kalman reference
    m, P = 0.0, 1.0
    for _ in range(30):
        x_true = a_coef * x_true + rng.normal(0, np.sqrt(q))
        z = x_true + rng.normal(0, np.sqrt(r_var))
        # KF predict/update
        m, P = a_coef * m, a_coef**2 * P + q
        K = P / (P + r_var)
        m, P = m + K * (z - m), (1 - K) * P
        # PF
        p.step(np.array([0.0]), np.array([z]), 1.0)

    pf_mean = float(p.point_estimate()[0])
    assert pf_mean == pytest.approx(m, abs=4 * np.sqrt(P / 2**10))
    # covariance estimate in the right ballpark
    assert float(p.point_covariance()) == pytest.approx(P, rel=0.35)


def test_bioreactor_filter_functions():
    """PF with the bioreactor f/g — the canonical rig's filter config
    (cf. /root/reference/sim_base.py:105-112)."""
    x_ss = np.array([0.28 / 180 * 1000, 640 / 24.6, 1000 / 116, 0.0, 0.0])
    x0 = GaussianSum.create(
        means=np.stack([x_ss, x_ss + 0.01]),
        covariances=np.stack([np.eye(5) * 1e-4, np.eye(5) * 1e-3]),
        weights=np.array([0.75, 0.25]),
    )
    state_pdf = GaussianSum.create(
        means=np.zeros((2, 5)),
        covariances=np.stack(
            [np.diag([1e-4, 1e-7, 1e-3, 1e-3, 1e-7]), np.diag([1e-3, 1e-6, 1e-2, 1e-2, 1e-6])]
        ),
        weights=np.array([0.75, 0.25]),
    )
    meas_pdf = GaussianSum.create(
        means=np.array([[1e-1, 0], [0, -1e-1]]),
        covariances=np.array([[[6e-2, 0], [0, 8e-2]], [[500, 100], [100, 700]]]),
        weights=np.array([0.85, 0.15]),
    )
    p = ParticleFilter(
        bio.Bioreactor.homeostatic_DEs,
        bio.Bioreactor.static_outputs,
        4096,
        x0,
        state_pdf,
        meas_pdf,
        seed=2,
    )
    u = np.array([0.06, 0.2])
    z = np.asarray(bio.static_outputs(x_ss, u, xp=np))
    for _ in range(3):
        p.step(u, z, 0.1)
    est = np.asarray(p.point_estimate())
    assert np.isfinite(est).all()
    # estimate stays near the steady state it's being measured at
    np.testing.assert_allclose(est[[0, 2]], x_ss[[0, 2]], rtol=0.5)


def test_point_estimate_weighted():
    state = pf.PFState(
        particles=jnp.array([[0.0, 0.0], [10.0, 20.0]]),
        weights=jnp.array([0.25, 0.75]),
        key=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(pf.point_estimate(state)), [7.5, 15.0])
    # point covariance equals max SV of weighted covariance
    w = np.array([0.25, 0.75])
    parts = np.array([[0.0, 0.0], [10.0, 20.0]])
    mean = w @ parts
    dist = parts - mean
    cov = dist.T @ (dist * w[:, None])
    expected = np.linalg.svd(cov, compute_uv=False)[0]
    assert float(pf.point_covariance(state)) == pytest.approx(expected, rel=1e-5)


def test_stabilized_update_survives_repeated_updates():
    """Linear-space weights underflow to all-zeros under repeated extreme
    updates; the log-space update stays normalized (the failure mode the
    reference patched with a manual /=1e3 rescale)."""
    f, g, x0, state_pdf, measurement_pdf = toy_parts()
    state = pf.init(jax.random.PRNGKey(0), 128, x0)
    z_far = np.array([1e4])  # measurement far in the tails
    u = np.array([0.1, 0.2])

    lin = state
    stab = state
    for _ in range(6):
        lin = pf.update(lin, jnp.asarray(u), jnp.asarray(z_far), g, measurement_pdf)
        stab = pf.update_stabilized(
            stab, jnp.asarray(u), jnp.asarray(z_far), g, measurement_pdf
        )
    assert float(jnp.sum(lin.weights)) == 0.0  # linear path underflows
    np.testing.assert_allclose(float(jnp.sum(stab.weights)), 1.0, rtol=1e-5)
    assert bool(jnp.isfinite(stab.weights).all())


def test_stabilized_update_matches_linear_when_benign():
    f, g, x0, state_pdf, measurement_pdf = toy_parts()
    state = pf.init(jax.random.PRNGKey(1), 256, x0)
    u, z = np.array([0.1, 0.2]), np.array([10.0])
    a = pf.update(state, jnp.asarray(u), jnp.asarray(z), g, measurement_pdf)
    b = pf.update_stabilized(state, jnp.asarray(u), jnp.asarray(z), g, measurement_pdf)
    wa = np.asarray(a.weights) / np.asarray(a.weights).sum()
    np.testing.assert_allclose(wa, np.asarray(b.weights), rtol=1e-3, atol=1e-7)
