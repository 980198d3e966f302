"""Simulation-harness tests: rig construction, metric math, and a short
closed loop with both filters."""
import numpy as np
import pytest

from gpu_se_tpu import sim
from gpu_se_tpu.filters import GaussianSumUnscentedKalmanFilter, ParticleFilter


def test_get_noise_pins():
    state_pdf, measurement_pdf = sim.get_noise()
    np.testing.assert_allclose(np.asarray(state_pdf.weights), [0.75, 0.25])
    np.testing.assert_allclose(np.asarray(measurement_pdf.weights), [0.85, 0.15])
    np.testing.assert_allclose(
        np.asarray(measurement_pdf.covariances[1]), [[500, 100], [100, 700]]
    )
    np.testing.assert_allclose(
        np.asarray(state_pdf.covariances[0]),
        np.diag([1e-4, 1e-7, 1e-3, 1e-3, 1e-7]),
        rtol=1e-6,
    )


def test_performance_is_itse():
    # performance computes integral of (y-r)^2 * t — the time-weighted ISE
    ts = np.linspace(0, 10, 101)
    ys = np.stack([np.ones_like(ts), 2 * np.ones_like(ts)], axis=1)
    r = np.zeros((101, 2))
    # integral of 1*t dt over [0,10] = 50; (2)^2 * t -> 200; total 250
    assert sim.performance(ys, r, ts) == pytest.approx(250.0, rel=1e-3)


def test_get_parts_canonical():
    bioreactor, lin_model, K, est = sim.get_parts(
        dt_control=1, N_particles=256, pf=True
    )
    assert isinstance(est, ParticleFilter)
    assert lin_model.Nx == 2 and lin_model.Ni == 2 and lin_model.No == 2
    assert K.P == 300 and K.M == 200
    # x0 mixture centered on the operating steady state
    est_x = np.asarray(est.point_estimate())
    np.testing.assert_allclose(est_x, bioreactor.X, rtol=0.3, atol=0.3)

    _, _, _, gsf = sim.get_parts(dt_control=1, N_particles=16, pf=False)
    assert isinstance(gsf, GaussianSumUnscentedKalmanFilter)


@pytest.mark.parametrize("pf", [True, False])
def test_short_closed_loop(pf):
    s = sim.Simulation(
        N_particles=256 if pf else 16,
        dt_control=1,
        dt_predict=0.5,
        end_time=4,
        pf=pf,
    )
    s.simulate()
    n = len(s.ts)
    assert s.us.shape == (n, 2)
    assert s.ys.shape == (n, 5)
    assert s.xs_f.shape[1] == 5
    assert np.isfinite(s.performance)
    assert s.mpc_frac is not None and s.mpc_frac > 0.5
    assert s.predict_count >= s.update_count
    # plant states stay near-physical: the Euler step clips at zero, then
    # additive plant noise may dip slightly negative (reference behavior,
    # /root/reference/sim_base.py:281)
    assert np.all(s.xs[:, :4] >= -1.0)
    # filter tracks the plant loosely even in a short run
    rel_err = np.abs(s.xs_f[-1][[0, 2]] - s.xs[-1][[0, 2]]) / (
        np.abs(s.xs[-1][[0, 2]]) + 1e-6
    )
    assert np.all(rel_err < 0.5)
