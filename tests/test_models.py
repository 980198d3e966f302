"""Model-layer tests: regression pins from the reference plus restored
analytic-Jacobian checks.

Covers /root/reference/tests/{biomodel_test,biomodel_linearise_test,
linearise_test}.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from gpu_se_tpu import models
from gpu_se_tpu.models import bioreactor as bio


def test_biomodel_staged_openloop():
    """Pin the staged 500-min open-loop run's final outputs
    (cf. /root/reference/tests/biomodel_test.py:47-51)."""
    end_time = 500
    ts = np.linspace(0, end_time, end_time * 10)
    dt = ts[1]

    reactor = models.Bioreactor(
        X0=np.array([3000 / 180, 1 / 24.6, 0 / 116, 0.0, 0.0]), high_N=True
    )

    us = [np.array([0.0, 0.0])]
    not_cleared = True
    for t in ts[1:]:
        if t < 25:
            us.append(np.array([0.0, 0.0]))
        elif t < 200:
            if not_cleared:
                reactor.X[[0, 2, 3, 4]] = 0
                not_cleared = False
                reactor.high_N = False
            us.append(np.array([0.06, 0.2]))
        elif t < 500:
            us.append(np.array([0.04, 0.1]))
        else:
            us.append(us[-1])
        reactor.step(dt, us[-1])

    final = reactor.outputs(us[-1])
    expected = np.array([280.0, 632.0, 1121.0, 0.0, 50.5])
    np.testing.assert_allclose(final, expected, rtol=2e-3, atol=0.5)


def test_find_ss_is_steady():
    x_ss = models.Bioreactor.find_SS(
        np.array([0.06, 0.2]), np.array([260 / 180, 640 / 24.6, 1000 / 116, 0, 0])
    )
    # biomass pinned
    assert x_ss[1] == pytest.approx(640 / 24.6)
    # residual ~ 0 on the other states (X[1] is held, its DE need not vanish)
    res = bio.homeostatic_des(x_ss, np.array([0.06, 0.2]), 1.0, xp=np)
    np.testing.assert_allclose(np.delete(res, 1), 0.0, atol=1e-9)


def test_biomodel_linearise_pin():
    """Discrete A[0,0] ~= 0.72648 for the canonical linearization
    (cf. /root/reference/tests/biomodel_linearise_test.py:28)."""
    reactor = models.Bioreactor(
        X0=models.Bioreactor.find_SS(
            np.array([0.06, 0.2]), np.array([260 / 180, 640 / 24.6, 1000 / 116, 0, 0])
        ),
        high_N=False,
    )
    lin = models.create_linear_model(
        reactor,
        x_bar=models.Bioreactor.find_SS(
            np.array([0.04, 0.1]), np.array([260 / 180, 640 / 24.6, 1000 / 116, 0, 0])
        ),
        u_bar=np.array([0.04, 0.1]),
        T=1,
    )
    assert lin.A[0, 0] == pytest.approx(0.72648, rel=1e-4)


def test_exact_vs_finite_difference_jacobians():
    """jacfwd path agrees with the reference's central-difference path."""
    from gpu_se_tpu.models.linear import _jacobians_exact, _jacobians_fd

    x_bar = models.Bioreactor.find_SS(
        np.array([0.04, 0.1]), np.array([260 / 180, 640 / 24.6, 1000 / 116, 0, 0])
    )
    u_bar = np.array([0.04, 0.1])
    reactor = models.Bioreactor(X0=x_bar.copy(), high_N=False)
    exact = _jacobians_exact(reactor, x_bar, u_bar)
    fd = _jacobians_fd(reactor, x_bar, u_bar)
    for e, f in zip(exact, fd):
        np.testing.assert_allclose(e, f, atol=1e-6)


def test_cstr_analytic_linearise():
    """Restored analytic-Jacobian test
    (cf. /root/reference/tests/linearise_test.py:5-36)."""
    X0 = np.array([1.0, 320.0])
    cstr = models.CSTRModel(X0)
    dt = 0.1
    lin = models.create_linear_model(cstr, X0, np.array([0.0]), dt)

    A, B, C, D = models.analytic_jacobians(X0, np.array([0.0]))
    Ad, Bd, Cd, Dd, _ = scipy.signal.cont2discrete((A, B, C, D), dt)
    for numeric, analytic in zip((lin.A, lin.B, lin.C, lin.D), (Ad, Bd, Cd, Dd)):
        assert np.max(np.abs(numeric - analytic)) < 1e-8


def test_linear_model_subset_and_transforms():
    reactor = models.Bioreactor(
        X0=models.Bioreactor.find_SS(
            np.array([0.06, 0.2]), np.array([260 / 180, 640 / 24.6, 1000 / 116, 0, 0])
        ),
        high_N=False,
    )
    lin = models.create_linear_model(
        reactor,
        x_bar=models.Bioreactor.find_SS(
            np.array([0.04, 0.1]), np.array([260 / 180, 640 / 24.6, 1000 / 116, 0, 0])
        ),
        u_bar=np.array([0.04, 0.1]),
        T=1,
    )
    full_A = lin.A.copy()
    lin.select_subset(states=[0, 2], inputs=[0, 1], outputs=[0, 2])
    assert lin.A.shape == (2, 2)
    np.testing.assert_allclose(lin.A, full_A[np.ix_([0, 2], [0, 2])])
    # round trips
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    np.testing.assert_allclose(lin.xd2n(lin.xn2d(x)), x[[0, 2]])
    u = np.array([0.5, 0.7])
    np.testing.assert_allclose(lin.ud2n(lin.un2d(u)), u)
    y = np.array([10.0, 20.0, 30.0, 40.0, 50.0])
    np.testing.assert_allclose(lin.yd2n(lin.yn2d(y)), y[[0, 2]])


def test_homeostatic_des_jnp_numpy_parity():
    """One implementation, two backends: jnp and numpy agree bitwise-ish."""
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = rng.uniform(-1, 30, size=5)
        u = rng.uniform(0, 0.3, size=2)
        a = bio.homeostatic_des(x, u, 0.1, xp=np)
        b = np.asarray(bio.homeostatic_des(jnp.asarray(x), jnp.asarray(u), 0.1, xp=jnp))
        # jnp default dtype is float32; compare at float32 precision
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_high_n_des_jnp_numpy_parity():
    rng = np.random.default_rng(1)
    for _ in range(10):
        x = rng.uniform(0, 20, size=5)
        u = rng.uniform(0, 0.3, size=2)
        a = bio.high_n_des(x, u, xp=np)
        b = np.asarray(bio.high_n_des(jnp.asarray(x), jnp.asarray(u), xp=jnp))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-10)


def test_homeostatic_des_vmap_jit():
    """The filter's f must vmap/jit over the particle axis."""
    key = jax.random.PRNGKey(0)
    xs = jax.random.uniform(key, (64, 5), minval=0.0, maxval=10.0)
    u = jnp.array([0.06, 0.2])
    f = jax.jit(jax.vmap(lambda x: bio.homeostatic_des(x, u, 0.1)))
    out = f(xs)
    assert out.shape == (64, 5)
    ref = np.stack(
        [bio.homeostatic_des(np.asarray(x), np.asarray(u), 0.1, xp=np) for x in xs]
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-10)


def test_euler_step_clips_negative_states():
    x = jnp.array([1e-6, 0.5, 1e-6, 1e-6, -3.0])
    u = jnp.array([0.5, 0.5])
    x1 = bio.euler_step(x, u, 10.0)
    assert float(x1[:4].min()) >= 0.0
    # Ch (index 4) is deliberately not clipped
    x_np = bio.euler_step(np.asarray(x, dtype=float), np.asarray(u, dtype=float), 10.0, xp=np)
    np.testing.assert_allclose(np.asarray(x1), x_np, rtol=1e-6)


def test_tank_models_step():
    tank = models.TankModel(np.array([1.0]), linear=False)
    tank.step(0.1, np.array([0.05]))
    assert tank.X.shape == (1,)
    diag = models.DiagTank(np.array([1.0, 1.0]))
    diag.step(0.1, np.array([0.05, 0.05]))
    linked = models.LinkedTanks(np.array([1.0, 1.0]))
    linked.step(0.1, np.array([0.05, 0.05]))
    # pure hooks linearize
    lin = models.create_linear_model(linked, np.array([1.0, 1.0]), np.array([0.05, 0.05]), 0.1)
    assert lin.A.shape == (2, 2)
