"""Scenario-axis parallelism for the MPC (BASELINE.json north star).

Two primitives over a batch of disturbance scenarios (x0, u_-1, bias):

* :func:`scenario_solve` — vmapped per-scenario QP solves, optionally
  ``shard_map``-ped over the mesh so each chip solves its shard of
  scenarios (Monte-Carlo evaluation, control-period sweeps).

* :func:`averaged_scenario_step` — the stochastic-MPC reduction: the
  per-scenario QP gradients are psum-averaged across the mesh before a
  single solve. For a linear model the cost gradient is linear in the
  scenario, so this equals solving at the scenario mean — the collective
  structure is what matters for the multi-chip path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from gpu_se_tpu.control import mpc as mpc_mod
from gpu_se_tpu.control.qp import _admm_solve
from gpu_se_tpu.parallel.mesh import PARTICLE_AXIS


def make_scenario_solver(mpc, mesh=None, axis: str = PARTICLE_AXIS):
    """Return ``solve(x0s, um1s, biases) -> (ctrls, y_preds, statuses)``
    solving one QP per scenario row, sharded over ``mesh`` if given."""
    consts, step_fn = mpc_mod.make_device_step(mpc)
    n_d = (mpc.M + 1) * mpc.Ni
    m_rows = mpc.qp.m

    def one(x0, um1, bias):
        warm_v = jnp.zeros(n_d, jnp.float32)
        warm_y = jnp.zeros(m_rows, jnp.float32)
        ctrl, y_pred, sol = step_fn(consts, x0, um1, bias, warm_v, warm_y)
        return ctrl, y_pred, sol.status

    batched = jax.vmap(one)

    if mesh is None:
        return jax.jit(batched)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None), P(axis)),
        check_vma=False,
    )
    def sharded(x0s, um1s, biases):
        return batched(x0s, um1s, biases)

    return jax.jit(sharded)


def make_averaged_scenario_step(mpc, mesh, axis: str = PARTICLE_AXIS):
    """Stochastic-MPC step: psum-average the scenario gradients across the
    mesh, then solve ONE QP. Returns ``step(x0s, um1, biases) -> ctrl``
    with x0s/biases sharded over scenarios."""
    consts, step_fn = mpc_mod.make_device_step(mpc)
    n_d = (mpc.M + 1) * mpc.Ni
    m_rows = mpc.qp.m

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded(x0s, um1, biases):
        # local scenario means, then global mean over ICI
        n_total = x0s.shape[0] * jax.lax.axis_size(axis)
        x0_mean = jax.lax.psum(jnp.sum(x0s, axis=0), axis) / n_total
        bias_mean = jax.lax.psum(jnp.sum(biases, axis=0), axis) / n_total
        ctrl, y_pred, sol = step_fn(
            consts, x0_mean, um1, bias_mean,
            jnp.zeros(n_d, jnp.float32), jnp.zeros(m_rows, jnp.float32),
        )
        return ctrl, y_pred

    return jax.jit(sharded)
