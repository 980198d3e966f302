"""MPC tests.

The keystone check rebuilds the reference's sparse simultaneous-form QP
layout verbatim (/root/reference/controller.py:97-262), solves it with the
generic DenseQP solver, and asserts the condensed MPC produces the same
control moves and one-step-ahead predictions — proving the condensation
preserves the reference optimizer exactly (including the u0-only input
constraint quirk and the bias integral action).

Also: closed-loop tank regression (cf.
/root/reference/tests/mpc_tests/tank_simulation_test.py) and solver-failure
contract.
"""
import numpy as np
import pytest
import scipy.sparse as sp

from gpu_se_tpu import models
from gpu_se_tpu.control import MPC, DenseQP, QPSettings, SOLVED
from gpu_se_tpu.models import LinearModel, TankModel, create_linear_model


# ----------------------------------------------------------------------
def numpy_admm_qp(H, A, q, l, u, max_iter=60000, tol=1e-9, warm=None):
    """Independent float64 ADMM QP solver (OSQP algorithm, incl. adaptive
    rho) used as ground truth for the formulation-equivalence tests.

    Returns ``(x, warm_state)`` so closed-loop callers can warm start.
    """
    n, m = H.shape[0], A.shape[0]
    sigma, alpha = 1e-6, 1.6
    eq = np.isclose(l, u)
    rho = np.where(eq, 1e3 * 0.1, 0.1)

    def factor(rho):
        K = H + sigma * np.eye(n) + A.T @ (rho[:, None] * A)
        return np.linalg.inv(K)

    K_inv = factor(rho)
    if warm is not None:
        x, z, y = (v.copy() for v in warm)
    else:
        x, z, y = np.zeros(n), np.zeros(m), np.zeros(m)
    l_c = np.where(np.isfinite(l), l, -1e30)
    u_c = np.where(np.isfinite(u), u, 1e30)
    for it in range(1, max_iter + 1):
        rhs = sigma * x - q + A.T @ (rho * z - y)
        xt = K_inv @ rhs
        x_new = alpha * xt + (1 - alpha) * x
        zt = A @ xt
        z_pre = alpha * zt + (1 - alpha) * z + y / rho
        z_new = np.clip(z_pre, l_c, u_c)
        y = rho * (z_pre - z_new)
        x, z = x_new, z_new
        if it % 50 == 0:
            prim = np.max(np.abs(A @ x - z))
            dual = np.max(np.abs(H @ x + q + A.T @ y))
            den_p = max(1e-10, np.abs(A @ x).max(), np.abs(z).max())
            den_d = max(1e-10, np.abs(H @ x).max(), np.abs(q).max(),
                        np.abs(A.T @ y).max())
            if prim < tol * max(1, den_p) and dual < tol * max(1, den_d):
                break
            factor_r = np.sqrt((prim / den_p) / max(dual / den_d, 1e-12))
            if factor_r > 5 or factor_r < 0.2:
                rho = np.clip(rho * factor_r, 1e-6, 1e6)
                K_inv = factor(rho)
    return x, (x, z, y)


# ----------------------------------------------------------------------
# Reference QP layout, transcribed from /root/reference/controller.py
# ----------------------------------------------------------------------
class ReferenceLayoutMPC:
    def __init__(self, P, M, Q, R, lin, ysp, y_bounds=None, u_bounds=None,
                 u_step_bounds=None):
        self.P, self.M, self.Q, self.R = P, M, Q, R
        self.model = lin
        Nx, Ni = lin.B.shape
        No = lin.C.shape[0]

        def unpack(bounds, dim):
            if bounds is None:
                return np.full(dim, -np.inf), np.full(dim, np.inf)
            lo, hi = [np.asarray(b, float) for b in zip(*bounds)]
            return lo, hi

        y_min, y_max = unpack(y_bounds, No)
        u_min, u_max = unpack(u_bounds, Ni)
        du_min, du_max = unpack(u_step_bounds, Ni)

        H = sp.block_diag([
            sp.csc_matrix(((P + 1) * Nx, (P + 1) * Nx)),
            sp.kron(sp.eye(P), Q),
            sp.csc_matrix((Ni, Ni)),
            sp.kron(sp.eye(M + 1), R),
        ], format="csc")
        q = np.hstack([
            np.zeros((P + 1) * Nx),
            np.kron(np.ones(P), -Q @ ysp),
            np.zeros((M + 2) * Ni),
        ])

        A_um1 = sp.hstack([
            sp.csc_matrix((Ni, (P + 1) * Nx + P * No)),
            sp.eye(Ni),
            sp.csc_matrix((Ni, (M + 1) * Ni)),
        ])

        A_state_x = sp.hstack([
            sp.vstack([
                -sp.eye(Nx),
                lin.A - sp.eye(Nx),
                sp.csc_matrix(((P - 1) * Nx, Nx)),
            ]),
            sp.vstack([
                sp.csc_matrix((Nx, P * Nx)),
                sp.kron(sp.eye(P, k=-1), lin.A) - sp.eye(P * Nx),
            ]),
        ])
        A_state_u = sp.vstack([
            sp.csc_matrix((Nx, (M + 2) * Ni)),
            sp.kron(
                sp.hstack([
                    sp.csc_matrix(([1], ([0], [0])), shape=(M, 1)),
                    sp.eye(M),
                    sp.csc_matrix((M, 1)),
                ]),
                lin.B,
            ),
            sp.csc_matrix(((P - M) * Nx, (M + 2) * Ni)),
        ])
        A_state = sp.hstack([A_state_x, sp.csc_matrix(((P + 1) * Nx, P * No)), A_state_u])
        b_state = np.hstack([np.zeros(Nx), np.zeros(P * Nx)])  # -x0 filled per step

        A_out_x = sp.kron(
            sp.hstack([sp.csc_matrix(([1], ([0], [0])), shape=(P, 1)), sp.eye(P)]),
            lin.C,
        )
        A_out_y = -sp.eye(P * No) + sp.eye(P * No, k=-No)
        A_out_u = sp.vstack([
            sp.kron(
                sp.hstack([
                    sp.csc_matrix(([1, 1], ([0, 0], [0, 1])), shape=(M, 2)),
                    sp.eye(M),
                ]),
                lin.D,
            ),
            sp.csc_matrix(((P - M) * No, (M + 2) * Ni)),
        ])
        A_output = sp.hstack([A_out_x, A_out_y, A_out_u])
        b_output = np.zeros(P * No)

        A_out_ineq = sp.hstack([
            sp.csc_matrix((P * No, (P + 1) * Nx)),
            sp.eye(P * No),
            sp.csc_matrix((P * No, (M + 2) * Ni)),
        ])
        A_steps = sp.hstack([
            sp.csc_matrix(((M + 1) * Ni, (P + 1) * Nx + P * No + Ni)),
            sp.eye((M + 1) * Ni),
        ])
        # reduced input constraint (the overwrite at controller.py:211-220)
        A_in = sp.hstack([
            sp.csc_matrix((Ni, (P + 1) * Nx + P * No)),
            sp.kron(np.ones((1, 2)), sp.eye(Ni)),
            sp.csc_matrix((Ni, M * Ni)),
        ])

        self.A = sp.vstack([A_um1, A_state, A_output, A_out_ineq, A_steps, A_in]).toarray()
        self.l = np.hstack([
            np.zeros(Ni), b_state, b_output,
            np.kron(np.ones(P), y_min), np.kron(np.ones(M + 1), du_min), u_min,
        ])
        self.u = np.hstack([
            np.zeros(Ni), b_state, b_output,
            np.kron(np.ones(P), y_max), np.kron(np.ones(M + 1), du_max), u_max,
        ])
        self.H = H.toarray()
        self.q = q
        self.Nx, self.Ni, self.No = Nx, Ni, No
        self.y_predicted = None
        self._warm = None

    def step(self, x0, um1, y0):
        Nx, Ni, No, P = self.Nx, self.Ni, self.No, self.P
        l, u = self.l.copy(), self.u.copy()
        l[:Ni] = um1
        u[:Ni] = um1
        l[Ni:Ni + Nx] = -x0
        u[Ni:Ni + Nx] = -x0
        bias = (y0 - self.y_predicted) if self.y_predicted is not None else np.zeros_like(y0)
        l[Ni + (P + 1) * Nx:Ni + (P + 1) * Nx + P * No] = np.tile(-bias, P)
        u[Ni + (P + 1) * Nx:Ni + (P + 1) * Nx + P * No] = np.tile(-bias, P)
        x, self._warm = numpy_admm_qp(self.H, self.A, self.q, l, u, warm=self._warm)
        m = (P + 1) * Nx + P * No + Ni
        ctrl = x[m:m + Ni] + um1
        self.y_predicted = x[(P + 1) * Nx:(P + 1) * Nx + No] - bias
        return ctrl


def random_stable_lin_model(seed, nx=2, ni=2, no=2, dt=1.0, with_d=True):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(nx, nx))
    A = 0.8 * A / np.max(np.abs(np.linalg.eigvals(A)))
    B = rng.normal(size=(nx, ni))
    C = rng.normal(size=(no, nx))
    D = rng.normal(size=(no, ni)) * (0.3 if with_d else 0.0)
    return LinearModel(A, B, C, D, dt, np.zeros(nx), np.zeros(ni),
                       np.zeros(nx), np.zeros(no))


@pytest.mark.parametrize("with_d", [False, True])
def test_condensed_matches_reference_layout(with_d):
    """Condensed MPC == reference simultaneous-form QP, over multiple
    steps with active bias correction."""
    P_h, M_h = 8, 4
    lin = random_stable_lin_model(0, with_d=with_d)
    Q = np.diag([1.0, 2.0])
    R = np.diag([0.5, 0.5])
    ysp = np.array([1.0, -0.5])
    u_bounds = [np.array([-2.0, 2.0]), np.array([-2.0, 2.0])]

    ref = ReferenceLayoutMPC(P_h, M_h, Q, R, lin, ysp, u_bounds=u_bounds)
    ours = MPC(P_h, M_h, Q, R, lin, ysp, u_bounds=u_bounds,
               qp_settings=QPSettings(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000))

    rng = np.random.default_rng(1)
    x = np.array([0.5, -0.3])
    um1 = np.zeros(2)
    for step_i in range(4):
        y0 = lin.C @ x + lin.D @ um1 + rng.normal(scale=0.01, size=2)
        u_ref = ref.step(x, um1, y0)
        u_ours = ours.step(x, um1, y0)
        np.testing.assert_allclose(u_ours, u_ref, atol=2e-3), f"step {step_i}"
        np.testing.assert_allclose(
            np.asarray(ours.y_predicted), ref.y_predicted, atol=2e-3
        )
        um1 = u_ours
        x = lin.A @ x + lin.B @ um1 + rng.normal(scale=0.01, size=2)


def test_condensed_matches_reference_layout_with_y_and_step_bounds():
    P_h, M_h = 6, 3
    lin = random_stable_lin_model(5, with_d=False)
    Q = np.eye(2)
    R = 0.1 * np.eye(2)
    ysp = np.array([0.5, 0.5])
    y_bounds = [np.array([-3.0, 3.0]), np.array([-3.0, 3.0])]
    du_bounds = [np.array([-0.5, 0.5]), np.array([-0.5, 0.5])]
    u_bounds = [np.array([-1.5, 1.5]), np.array([-1.5, 1.5])]

    ref = ReferenceLayoutMPC(P_h, M_h, Q, R, lin, ysp, y_bounds, u_bounds, du_bounds)
    ours = MPC(P_h, M_h, Q, R, lin, ysp, y_bounds, u_bounds, du_bounds,
               qp_settings=QPSettings(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000))

    x = np.array([0.2, -0.4])
    um1 = np.zeros(2)
    for _ in range(3):
        y0 = lin.C @ x
        u_ref = ref.step(x, um1, y0)
        u_ours = ours.step(x, um1, y0)
        np.testing.assert_allclose(u_ours, u_ref, atol=5e-3)
        um1 = u_ours
        x = lin.A @ x + lin.B @ um1


def test_tank_closed_loop():
    """Nonlinear tank settles to setpoint under MPC with bias correction
    (cf. /root/reference/tests/mpc_tests/tank_simulation_test.py)."""
    end_time = 80
    ts = np.linspace(0, end_time, end_time * 100)
    dt = ts[1]
    dt_control = 1.0

    X0 = np.array([50.0])
    tank = TankModel(X0.copy(), linear=False)
    lin = create_linear_model(
        TankModel(np.array([50.0]), linear=False),
        x_bar=np.array([50.0]), u_bar=np.array([10.0]), T=dt_control,
    )
    r = np.array([100.0])
    K = MPC(P=20, M=8, Q=np.diag([10.0]), R=np.diag([0.0]),
            lin_model=lin, ysp=lin.yn2d(r))

    X_op, U_op = np.array([50.0]), np.array([10.0])
    Y_op = np.array([50.0])
    us = [U_op.copy()]
    ys = [Y_op.copy()]
    biass = []
    t_next = 0.0
    for t in ts[1:]:
        tank.step(dt, us[-1])
        ys.append(tank.outputs(us[-1]).copy())
        if t > t_next:
            if K.y_predicted is not None:
                biass.append(ys[-1] - Y_op - K.y_predicted)
            u = K.step(tank.X - X_op, us[-1] - U_op, ys[-1] - Y_op)
            us.append(u + U_op)
            t_next += dt_control
        else:
            us.append(us[-1])

    ys = np.array(ys)
    biass = np.array(biass)
    # settles to the setpoint (cf. test_nonlinear_tank_SS, abs=1e-3)
    np.testing.assert_allclose(ys[5000:].ravel(), np.full(len(ys) - 5000, r[0]), atol=1e-3)
    # bias settles to a constant (cf. test_nonlinear_tank_bias); there is
    # one bias sample per control step (~80 total), so window on the
    # second half — biass[100:] would be empty and the assert vacuous
    late_bias = biass[len(biass) // 2:]
    assert late_bias.size > 0
    np.testing.assert_allclose(late_bias - late_bias.mean(), 0.0, atol=1e-6)


def test_solver_failure_raises():
    """Infeasible bounds must raise ValueError for the caller-side
    fallback (cf. /root/reference/controller.py:270-271)."""
    lin = random_stable_lin_model(2, with_d=False)
    # u0 >= 1 conflicts with du_0 <= -5 (at um1 = 0): primal infeasible
    K = MPC(5, 2, np.eye(2), np.eye(2), lin, np.zeros(2),
            u_bounds=[np.array([1.0, np.inf]), np.array([1.0, np.inf])],
            u_step_bounds=[np.array([-np.inf, -5.0]), np.array([-np.inf, -5.0])])
    with pytest.raises(ValueError):
        K.step(np.zeros(2), np.zeros(2), np.zeros(2))


def test_input_clamp():
    lin = random_stable_lin_model(3, with_d=False)
    K = MPC(5, 2, np.eye(2), np.eye(2), lin, np.zeros(2))
    u = K.step(np.full(2, 1e12), np.zeros(2), np.zeros(2))  # clamped to 1e10
    assert np.isfinite(u).all()


def test_canonical_bioreactor_rig_mpc():
    """The canonical rig MPC (cf. /root/reference/sim_base.py:75-86) at
    dt_control=1: P=300, M=200 — solves and returns finite controls."""
    reactor = models.Bioreactor(
        X0=models.Bioreactor.find_SS(
            np.array([0.06, 0.2]), np.array([260 / 180, 640 / 24.6, 1000 / 116, 0, 0])
        ),
        high_N=False,
    )
    lin = create_linear_model(
        reactor,
        x_bar=models.Bioreactor.find_SS(
            np.array([0.04, 0.1]), np.array([260 / 180, 640 / 24.6, 1000 / 116, 0, 0])
        ),
        u_bar=np.array([0.04, 0.1]),
        T=1.0,
    )
    lin.select_subset(states=[0, 2], inputs=[0, 1], outputs=[0, 2])
    K = MPC(
        P=300, M=200, Q=np.diag([0.1, 1.0]), R=np.diag([1.0, 1.0]),
        lin_model=lin,
        ysp=lin.yn2d(np.array([280.0, 850.0]), subselect=False),
        u_bounds=[
            np.array([0, np.inf]) - lin.u_bar[0],
            np.array([0, np.inf]) - lin.u_bar[1],
        ],
    )
    x0 = lin.xn2d(reactor.X)
    u = K.step(x0, np.array([0.06, 0.2]) - lin.u_bar, lin.yn2d(reactor.outputs(None)))
    assert np.isfinite(u).all()
    # input bound (u >= 0 in natural units) respected
    assert np.all(u + lin.u_bar >= -1e-5)
