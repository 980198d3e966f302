"""Dense ADMM QP solver tests: closed-form cases, KKT verification on
random problems, warm starting, and infeasibility detection."""
import numpy as np
import pytest

from gpu_se_tpu.control.qp import (
    DUAL_INFEASIBLE,
    PRIMAL_INFEASIBLE,
    SOLVED,
    DenseQP,
    QPSettings,
)


def make_random_qp(n, m, seed, strongly_convex=True):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    P = M @ M.T + (1.0 if strongly_convex else 0.0) * np.eye(n)
    A = rng.normal(size=(m, n))
    q = rng.normal(size=n)
    x_feas = rng.normal(size=n)
    margin = rng.uniform(0.1, 1.0, size=m)
    l = A @ x_feas - margin
    u = A @ x_feas + margin
    return P, A, q, l, u


def check_kkt(P, A, q, l, u, x, y, tol=5e-3):
    """Stationarity + primal feasibility + complementary slackness."""
    scale = max(1.0, np.abs(q).max(), np.abs(P @ x).max())
    stat = np.abs(P @ x + q + A.T @ y).max() / scale
    assert stat < tol, f"stationarity {stat}"
    ax = A @ x
    assert np.all(ax <= u + tol * np.maximum(1, np.abs(u)))
    assert np.all(ax >= l - tol * np.maximum(1, np.abs(l)))
    # complementarity: y+ active at u, y- active at l
    for i in range(len(y)):
        if y[i] > tol:
            assert ax[i] >= u[i] - 5e-2 * max(1, abs(u[i])), f"row {i} not active at u"
        if y[i] < -tol:
            assert ax[i] <= l[i] + 5e-2 * max(1, abs(l[i])), f"row {i} not active at l"


def test_unconstrained():
    P = np.diag([2.0, 4.0])
    q = np.array([-2.0, -8.0])
    qp = DenseQP(P, np.zeros((0, 2)), q_pattern=q)
    sol = qp.solve(q, np.zeros(0), np.zeros(0))
    assert int(sol.status) == SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 2.0], atol=1e-3)


def test_box_clipped():
    # diagonal P, box constraints: solution is clipped unconstrained optimum
    P = np.diag([1.0, 1.0, 1.0])
    q = -np.array([5.0, 0.5, -3.0])  # unconstrained opt: [5, 0.5, -3]
    A = np.eye(3)
    l = -np.ones(3)
    u = np.ones(3)
    qp = DenseQP(P, A, l, u, q)
    sol = qp.solve(q, l, u)
    assert int(sol.status) == SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 0.5, -1.0], atol=1e-3)


def test_equality_constrained_closed_form():
    rng = np.random.default_rng(0)
    n, p = 6, 2
    M = rng.normal(size=(n, n))
    P = M @ M.T + np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(p, n))
    b = rng.normal(size=p)
    # KKT closed form
    kkt = np.block([[P, A.T], [A, np.zeros((p, p))]])
    rhs = np.concatenate([-q, b])
    x_star = np.linalg.solve(kkt, rhs)[:n]

    qp = DenseQP(P, A, b, b, q)
    sol = qp.solve(q, b, b)
    assert int(sol.status) == SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), x_star, atol=5e-3)


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_random_qp_kkt(seed):
    n, m = 20, 30
    P, A, q, l, u = make_random_qp(n, m, seed)
    qp = DenseQP(P, A, l, u, q)
    sol = qp.solve(q, l, u)
    assert int(sol.status) == SOLVED, f"status {int(sol.status)} iters {int(sol.iterations)}"
    check_kkt(P, A, q, l, u, np.asarray(sol.x, float), np.asarray(sol.y, float))


def test_infinite_bounds():
    P, A, q, l, u = make_random_qp(10, 15, 7)
    l[::2] = -np.inf
    u[1::2] = np.inf
    qp = DenseQP(P, A, l, u, q)
    sol = qp.solve(q, l, u)
    assert int(sol.status) == SOLVED
    check_kkt(P, A, q, np.where(np.isinf(l), -1e30, l), np.where(np.isinf(u), 1e30, u),
              np.asarray(sol.x, float), np.asarray(sol.y, float))


def test_update_bounds_warm_start():
    """The OSQP usage pattern: fixed (P, A), changing (q, l, u)."""
    P, A, q, l, u = make_random_qp(12, 18, 9)
    qp = DenseQP(P, A, l, u, q)
    sol1 = qp.solve(q, l, u)
    assert int(sol1.status) == SOLVED
    # shift the constraint window slightly and warm start
    l2, u2 = l + 0.05, u + 0.05
    sol2 = qp.solve(q, l2, u2, x0=sol1.x, y0=sol1.y)
    assert int(sol2.status) == SOLVED
    check_kkt(P, A, q, l2, u2, np.asarray(sol2.x, float), np.asarray(sol2.y, float))
    # warm-started solve should converge in fewer iterations than cold
    sol2_cold = qp.solve(q, l2, u2)
    assert int(sol2.iterations) <= int(sol2_cold.iterations)


def test_primal_infeasible_detected():
    # x >= 1 and x <= -1 simultaneously
    P = np.eye(1)
    A = np.array([[1.0], [1.0]])
    l = np.array([1.0, -np.inf])
    u = np.array([np.inf, -1.0])
    qp = DenseQP(P, A, l, u, np.zeros(1))
    sol = qp.solve(np.zeros(1), l, u)
    assert int(sol.status) == PRIMAL_INFEASIBLE


def test_dual_infeasible_detected():
    # min x subject to x <= 0: unbounded below
    P = np.zeros((1, 1))
    q = np.array([1.0])
    A = np.array([[1.0]])
    l = np.array([-np.inf])
    u = np.array([0.0])
    qp = DenseQP(P, A, l, u, q)
    sol = qp.solve(q, l, u)
    assert int(sol.status) == DUAL_INFEASIBLE


def test_tight_tolerance():
    """Iterative refinement keeps f32 ADMM accurate at 1e-5 tolerances."""
    P, A, q, l, u = make_random_qp(8, 12, 11)
    qp = DenseQP(P, A, l, u, q, settings=QPSettings(eps_abs=1e-5, eps_rel=1e-5))
    sol = qp.solve(q, l, u)
    assert int(sol.status) == SOLVED
    check_kkt(P, A, q, l, u, np.asarray(sol.x, float), np.asarray(sol.y, float), tol=1e-3)
