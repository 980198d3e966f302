"""Scenario-axis MPC tests: batched QP solves, the exact stacked
scenario QP (shared first move), and the consensus-ADMM sharded path.

Key facts pinned here:
* certainty equivalence — with no binding constraints the scenario
  solution EQUALS solving at the scenario mean (linear model);
* with an asymmetrically binding output constraint the scenario solution
  DIFFERS from solve-at-mean and keeps every scenario feasible (the
  VERDICT round-1 "degenerate stochastic MPC" fix);
* consensus ADMM (unsharded and 8-way sharded) converges to the stacked
  optimum.
"""
import jax.numpy as jnp
import numpy as np

from gpu_se_tpu.control import DenseQP, MPC, ScenarioMPC, consensus_consts
from gpu_se_tpu.parallel import make_mesh
from gpu_se_tpu.parallel.scenario import (
    make_consensus_scenario_step,
    make_scenario_solver,
)
from tests.test_mpc import random_stable_lin_model
from tests.test_qp import make_random_qp


def test_solve_batch_matches_loop():
    P, A, q, l, u = make_random_qp(8, 12, 21)
    qp = DenseQP(P, A, l, u, q)
    rng = np.random.default_rng(0)
    qs = np.stack([q + rng.normal(scale=0.1, size=8) for _ in range(5)])
    ls = np.tile(l, (5, 1))
    us_b = np.tile(u, (5, 1))
    batch = qp.solve_batch(qs, ls, us_b)
    for i in range(5):
        single = qp.solve(qs[i], l, u)
        assert int(batch.status[i]) == 1
        np.testing.assert_allclose(
            np.asarray(batch.x[i]), np.asarray(single.x), atol=2e-3
        )


def _make_mpc():
    lin = random_stable_lin_model(11, with_d=False)
    return MPC(
        10, 4, np.eye(2), 0.5 * np.eye(2), lin, np.array([0.3, -0.2]),
        u_bounds=[np.array([-2.0, 2.0]), np.array([-2.0, 2.0])],
    ), lin


def test_scenario_solver_unsharded_vs_sharded():
    K, lin = _make_mpc()
    rng = np.random.default_rng(1)
    n_sc = 16
    x0s = jnp.asarray(rng.normal(scale=0.3, size=(n_sc, 2)), jnp.float32)
    um1s = jnp.zeros((n_sc, 2), jnp.float32)
    biases = jnp.asarray(rng.normal(scale=0.05, size=(n_sc, 2)), jnp.float32)

    solve_plain = make_scenario_solver(K)
    ctrls0, preds0, st0 = solve_plain(x0s, um1s, biases)
    assert np.all(np.asarray(st0) == 1)

    mesh = make_mesh(8)
    solve_sharded = make_scenario_solver(K, mesh)
    ctrls1, preds1, st1 = solve_sharded(x0s, um1s, biases)
    np.testing.assert_allclose(np.asarray(ctrls1), np.asarray(ctrls0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(preds1), np.asarray(preds0), atol=1e-3)

    # per-scenario solves match the host-shell MPC
    for i in range(0, n_sc, 5):
        K.y_predicted = None
        K._warm_v = jnp.zeros_like(K._warm_v)
        K._warm_y = jnp.zeros_like(K._warm_y)
        u_host = K.step(np.asarray(x0s[i], float), np.zeros(2), np.zeros(2))
        if np.allclose(np.asarray(biases[i]), 0):
            np.testing.assert_allclose(np.asarray(ctrls0[i]), u_host, atol=1e-4)


# ----------------------------------------------------------------------
# True scenario MPC (shared first move)
# ----------------------------------------------------------------------
_P_HOR, _M_HOR = 8, 3


def _scenarios(asym=True):
    """4 scenarios; one outlier if asym."""
    x0s = np.array(
        [[0.1, 0.05], [-0.1, 0.02], [0.05, -0.08], [1.6, 1.2] if asym else [0.0, 0.0]]
    )
    biases = np.zeros((4, 2))
    um1 = np.zeros(2)
    return x0s, um1, biases


def _mean_mpc_ctrl(lin, x0s, um1, biases, **kw):
    K = MPC(_P_HOR, _M_HOR, np.eye(2), 0.5 * np.eye(2), lin,
            np.array([0.3, -0.2]), **kw)
    solve = make_scenario_solver(K)
    ctrl, _, st = solve(
        jnp.asarray(x0s.mean(axis=0)[None], jnp.float32),
        jnp.asarray(um1[None], jnp.float32),
        jnp.asarray(biases.mean(axis=0)[None], jnp.float32),
    )
    assert int(st[0]) == 1
    return np.asarray(ctrl[0], float)


def test_scenario_mpc_certainty_equivalence_unconstrained():
    """No binding constraints -> scenario solution == solve-at-mean."""
    lin = random_stable_lin_model(11, with_d=False)
    x0s, um1, biases = _scenarios()
    smpc = ScenarioMPC(_P_HOR, _M_HOR, np.eye(2), 0.5 * np.eye(2), lin,
                       np.array([0.3, -0.2]), n_scenarios=4)
    ctrl, _ = smpc.step(x0s, um1, biases)
    ctrl_mean = _mean_mpc_ctrl(lin, x0s, um1, biases)
    np.testing.assert_allclose(ctrl, ctrl_mean, atol=5e-4)


def _binding_setup():
    lin = random_stable_lin_model(11, with_d=False)
    x0s, um1, biases = _scenarios(asym=True)
    # unconstrained, the outlier scenario's outputs reach ~1.1 while the
    # others stay below 0.4 — so +-0.8 binds ONLY the outlier (+-0.65 and
    # tighter is infeasible for the shared first move)
    y_bounds = [np.array([-0.8, 0.8]), np.array([-0.8, 0.8])]
    return lin, x0s, um1, biases, y_bounds


def test_scenario_mpc_differs_from_mean_under_binding_constraint():
    lin, x0s, um1, biases, y_bounds = _binding_setup()
    smpc = ScenarioMPC(_P_HOR, _M_HOR, np.eye(2), 0.5 * np.eye(2), lin,
                       np.array([0.3, -0.2]), n_scenarios=4, y_bounds=y_bounds)
    ctrl, _ = smpc.step(x0s, um1, biases)
    ctrl_mean = _mean_mpc_ctrl(lin, x0s, um1, biases, y_bounds=y_bounds)

    # the outlier scenario's output constraint binds asymmetrically:
    # the shared first move must hedge and differ from solve-at-mean
    assert np.max(np.abs(ctrl - ctrl_mean)) > 1e-3, (ctrl, ctrl_mean)

    # sanity: the constraint is actually active for the stacked solution
    cd = smpc._cd
    du0, moves = smpc.last_moves()
    y_free = smpc._y_free(x0s, um1, biases)
    worst = -np.inf
    for s in range(4):
        d_s = np.concatenate([du0, moves[s].reshape(-1)])
        ys = y_free[s] + cd.theta @ d_s
        # every scenario stays feasible (small ADMM tolerance slack)
        assert np.all(ys <= cd.y_hi + 1e-3) and np.all(ys >= cd.y_lo - 1e-3)
        worst = max(worst, np.max(np.abs(ys) - 0.8))
    assert worst > -1e-2  # some output sits on (or at) the bound


def test_consensus_matches_stacked():
    lin, x0s, um1, biases, y_bounds = _binding_setup()
    smpc = ScenarioMPC(_P_HOR, _M_HOR, np.eye(2), 0.5 * np.eye(2), lin,
                       np.array([0.3, -0.2]), n_scenarios=4, y_bounds=y_bounds)
    ctrl_exact, _ = smpc.step(x0s, um1, biases)

    consts, settings, dims = consensus_consts(
        lin, _P_HOR, _M_HOR, np.eye(2), 0.5 * np.eye(2),
        np.array([0.3, -0.2]), y_bounds=y_bounds,
    )
    step = make_consensus_scenario_step(settings, dims, n_outer=60)
    ctrl, gap, worst = step(
        consts,
        jnp.asarray(x0s, jnp.float32),
        jnp.asarray(um1, jnp.float32),
        jnp.asarray(biases, jnp.float32),
    )
    assert int(worst) == 1
    assert float(gap) < 1e-3
    np.testing.assert_allclose(np.asarray(ctrl, float), ctrl_exact, atol=2e-3)


def test_consensus_sharded_matches_unsharded():
    lin, x0s, um1, biases, y_bounds = _binding_setup()
    # 8 scenarios so the 8-device mesh gets one each
    x0s = np.concatenate([x0s, x0s * 0.5])
    biases = np.concatenate([biases, biases])

    consts, settings, dims = consensus_consts(
        lin, _P_HOR, _M_HOR, np.eye(2), 0.5 * np.eye(2),
        np.array([0.3, -0.2]), y_bounds=y_bounds,
    )
    x0s_j = jnp.asarray(x0s, jnp.float32)
    um1_j = jnp.asarray(um1, jnp.float32)
    b_j = jnp.asarray(biases, jnp.float32)

    plain = make_consensus_scenario_step(settings, dims, n_outer=40)
    ctrl0, gap0, st0 = plain(consts, x0s_j, um1_j, b_j)
    assert int(st0) == 1

    mesh = make_mesh(8)
    sharded = make_consensus_scenario_step(settings, dims, mesh, n_outer=40)
    ctrl1, gap1, st1 = sharded(consts, x0s_j, um1_j, b_j)
    assert int(st1) == 1
    np.testing.assert_allclose(np.asarray(ctrl1), np.asarray(ctrl0), atol=5e-4)
