"""Fused scan-loop tests: event masks replicate the reference timers; the
on-device loop regulates the plant and stays finite."""
import jax
import numpy as np

from gpu_se_tpu import sim
from gpu_se_tpu.filters import particle as pf_core
from gpu_se_tpu.sim.loop import event_masks, make_scan_loop


def test_event_masks_match_reference_timers():
    ts = np.linspace(0, 50, 500)
    pm, cm = event_masks(ts, dt_control=1.0, dt_predict=0.1)
    # replicate the reference loop literally
    t_nc, t_np_ = 0.0, 0.0
    for i, t in enumerate(ts[1:]):
        ep = t > t_np_
        if ep:
            t_np_ += 0.1
        ec = t > t_nc
        if ec:
            t_nc += 1.0
        assert pm[i] == ep and cm[i] == ec
    # roughly one control event per dt_control
    assert 48 <= cm.sum() <= 51
    assert pm.sum() > cm.sum()


def test_scan_loop_runs_and_regulates():
    bioreactor, lin_model, K, est = sim.get_parts(dt_control=1, N_particles=512, pf=True)
    state_pdf, measurement_pdf = sim.get_noise()
    run, ts = make_scan_loop(
        K, lin_model, state_pdf.dist, measurement_pdf.dist,
        end_time=20.0, dt_control=1.0, dt_predict=0.1,
    )
    rec = run(est.state, np.asarray(bioreactor.X), jax.random.PRNGKey(7))
    us = np.asarray(rec.us)
    xs = np.asarray(rec.xs)
    xs_f = np.asarray(rec.xs_f)
    assert us.shape == (len(ts) - 1, 2)
    assert np.isfinite(us).all() and np.isfinite(xs).all() and np.isfinite(xs_f).all()
    # controller engaged: inputs deviate from the fallback at some point
    assert np.abs(us - np.array([0.06, 0.2])).max() > 1e-4
    # filter tracks the plant's measured states within loose tolerance
    rel = np.abs(xs_f[-1, [0, 2]] - xs[-1, [0, 2]]) / (np.abs(xs[-1, [0, 2]]) + 1e-6)
    assert np.all(rel < 0.5)
    # QP solved at (almost) every control event
    assert np.mean(np.asarray(rec.status) == 1) > 0.95


def test_scan_loop_deterministic_by_key():
    _, lin_model, K, est = sim.get_parts(dt_control=1, N_particles=128, pf=True)
    state_pdf, measurement_pdf = sim.get_noise()
    run, ts = make_scan_loop(
        K, lin_model, state_pdf.dist, measurement_pdf.dist,
        end_time=5.0, dt_control=1.0, dt_predict=0.5,
    )
    x0 = np.array([1.5, 26.0, 8.6, 0.0, 0.0])
    a = run(est.state, x0, jax.random.PRNGKey(3))
    b = run(est.state, x0, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(a.us), np.asarray(b.us))
    c = run(est.state, x0, jax.random.PRNGKey(4))
    assert not np.array_equal(np.asarray(a.ys_meas), np.asarray(c.ys_meas))


def test_scan_loop_consistent_with_stepwise_harness():
    """The fused scan loop and the host-loop Simulation implement the same
    closed loop; over a short horizon with the same rig their trajectories
    must land in the same neighborhood (different RNG streams, so this is
    a behavioral-consistency check, not bitwise parity)."""
    end_time, dtc = 10, 1.0
    s = sim.Simulation(N_particles=256, dt_control=dtc, dt_predict=0.1,
                       end_time=end_time, pf=True, seed=0)
    s.simulate()

    bioreactor, lin_model, K, est = sim.get_parts(dt_control=dtc, N_particles=256)
    state_pdf, measurement_pdf = sim.get_noise()
    run, ts = make_scan_loop(K, lin_model, state_pdf.dist, measurement_pdf.dist,
                             end_time=end_time, dt_control=dtc, dt_predict=0.1)
    rec = run(est.state, np.asarray(bioreactor.X), jax.random.PRNGKey(0))

    xs_scan = np.asarray(rec.xs)
    # same plant regime: glucose/fumarate states in the same range
    for idx in (0, 2):
        a = s.xs[-1, idx]
        b = xs_scan[-1, idx]
        assert abs(a - b) / (abs(a) + 1e-6) < 0.5, (idx, a, b)
    # both loops keep the controller engaged
    assert np.abs(np.asarray(rec.us) - np.array([0.06, 0.2])).max() > 1e-4


def test_scan_loop_with_gsukf():
    from gpu_se_tpu.filters import gs_ukf

    bioreactor, lin_model, K, est = sim.get_parts(dt_control=1, N_particles=16, pf=False)
    state_pdf, measurement_pdf = sim.get_noise()
    run, ts = make_scan_loop(
        K, lin_model, state_pdf.dist, measurement_pdf.dist,
        end_time=8, dt_control=1.0, dt_predict=0.5, filter_core=gs_ukf,
    )
    rec = run(est.state, np.asarray(bioreactor.X), jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(rec.xs_f)).all()
    assert np.isfinite(np.asarray(rec.us)).all()
    assert np.mean(np.asarray(rec.status) == 1) > 0.9
