"""Fully on-device closed-loop simulation via ``lax.scan``.

The reference's event loop crosses the host<->device boundary >= 4 times
per control step (SURVEY.md section 3.1). Here the plant truth, the
particle filter, and the MPC QP all live inside one jitted ``lax.scan``:
zero host round trips for the whole trajectory, so the loop runs at
device speed and can be vmapped over Monte-Carlo seeds (the
``performance_vs_control_period`` experiment's inner loop).

Event timing replicates the reference exactly: the float-comparison
timers (``t > t_next_predict`` etc., /root/reference/sim_base.py:247-276)
are evaluated on host over the known time grid into static boolean masks
that the scan consumes.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpu_se_tpu.control.qp import SOLVED
from gpu_se_tpu.distributions.gaussian_sum import GaussianSum
from gpu_se_tpu.filters import particle as pf_core
from gpu_se_tpu.models import bioreactor as bio


def event_masks(ts: np.ndarray, dt_control: float, dt_predict: float):
    """Replicate the reference timer logic over the time grid."""
    t_next_control, t_next_predict = 0.0, 0.0
    predict_mask = np.zeros(len(ts) - 1, dtype=bool)
    control_mask = np.zeros(len(ts) - 1, dtype=bool)
    for i, t in enumerate(ts[1:]):
        if t > t_next_predict:
            predict_mask[i] = True
            t_next_predict += dt_predict
        if t > t_next_control:
            control_mask[i] = True
            t_next_control += dt_control
    return predict_mask, control_mask


class LoopRecord(NamedTuple):
    us: jax.Array
    xs: jax.Array
    ys_meas: jax.Array
    xs_f: jax.Array
    status: jax.Array


def make_scan_loop(
    mpc,
    lin_model,
    state_pdf: GaussianSum,
    measurement_pdf: GaussianSum,
    end_time: float = 50.0,
    dt_control: float = 1.0,
    dt_predict: float = 0.1,
    fallback_u=np.array([0.06, 0.2]),
    filter_core=None,
):
    """Build ``run(filter_state, x_plant, key) -> LoopRecord`` for the
    canonical rig, fused into a single jit.

    ``mpc`` is a :class:`gpu_se_tpu.control.mpc.MPC`; its device-step
    constants are captured as jit arguments. ``filter_core`` selects the
    estimator module (``gpu_se_tpu.filters.particle`` by default, or
    ``gpu_se_tpu.filters.gs_ukf`` — both expose the same functional
    predict/update/resample/point_estimate surface).
    """
    from gpu_se_tpu.control import mpc as mpc_mod

    core = filter_core if filter_core is not None else pf_core

    ts = np.linspace(0, end_time, int(end_time * 10))
    dt = float(ts[1])
    predict_mask, control_mask = event_masks(ts, dt_control, dt_predict)

    mpc_consts, mpc_step = mpc_mod.make_device_step(mpc)
    n_d = (mpc.M + 1) * mpc.Ni
    m_rows = mpc.qp.m
    settings = mpc.qp.settings

    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    out_idx = jnp.asarray(np.asarray(lin_model.outputs, dtype=np.int32))
    in_idx = jnp.asarray(np.asarray(lin_model.inputs, dtype=np.int32))
    state_sel = jnp.asarray(np.asarray(lin_model.states, dtype=np.int32))
    x_bar = jnp.asarray(lin_model.x_bar, jnp.float32)
    u_bar = jnp.asarray(lin_model.u_bar, jnp.float32)
    y_bar = jnp.asarray(lin_model.y_bar, jnp.float32)
    fallback = jnp.asarray(fallback_u, jnp.float32)

    def run(pf_state, x_plant, key):
        x_plant = jnp.asarray(x_plant, jnp.float32)

        def body(carry, inp):
            pf_state, x, u, y_pred, have_pred, warm_v, warm_y, key = carry
            do_predict, do_control = inp

            # --- filter predict (every dt_predict) ---
            pf_state = jax.lax.cond(
                do_predict,
                lambda s: core.predict(s, u, jnp.float32(dt), f, state_pdf),
                lambda s: s,
                pf_state,
            )

            # --- measurement of current plant output ---
            key, k_meas, k_state = jax.random.split(key, 3)
            y_full = bio.all_outputs(x)
            z = y_full[out_idx] + measurement_pdf.draw(k_meas, ())[0]

            # --- control event: update + resample + MPC ---
            def do_ctrl(args):
                pf_state, u, y_pred, have_pred, warm_v, warm_y = args
                pf_state = core.update(pf_state, u, z, g, measurement_pdf)
                pf_state = core.resample(pf_state)
                x_hat = core.point_estimate(pf_state)
                x0_dev = x_hat[state_sel] - x_bar
                um1_dev = u[in_idx] - u_bar
                bias = jnp.where(have_pred, (z - y_bar) - y_pred, jnp.zeros_like(y_pred))
                ctrl, y_pred_new, sol = mpc_step(
                    mpc_consts, x0_dev, um1_dev, bias, warm_v, warm_y
                )
                ok = sol.status == SOLVED
                u_new = jnp.where(ok, ctrl + u_bar, fallback)
                y_pred_new = jnp.where(ok, y_pred_new, y_pred)
                warm_v = jnp.where(ok, sol.x, jnp.zeros_like(sol.x))
                warm_y = jnp.where(ok, sol.y, jnp.zeros_like(sol.y))
                return pf_state, u_new, y_pred_new, ok | have_pred, warm_v, warm_y, sol.status

            def no_ctrl(args):
                pf_state, u, y_pred, have_pred, warm_v, warm_y = args
                return (
                    pf_state, u, y_pred, have_pred, warm_v, warm_y,
                    jnp.asarray(SOLVED, jnp.int32),
                )

            pf_state, u, y_pred, have_pred, warm_v, warm_y, status = jax.lax.cond(
                do_control, do_ctrl, no_ctrl,
                (pf_state, u, y_pred, have_pred, warm_v, warm_y),
            )

            # --- plant Euler step + state noise ---
            x = bio.euler_step(x, u, dt) + state_pdf.draw(k_state, ())[0]

            record = LoopRecord(
                us=u,
                xs=x,
                ys_meas=z,
                xs_f=core.point_estimate(pf_state),
                status=status,
            )
            return (pf_state, x, u, y_pred, have_pred, warm_v, warm_y, key), record

        init = (
            pf_state,
            x_plant,
            jnp.asarray(fallback_u, jnp.float32),
            jnp.zeros(mpc.No, jnp.float32),
            jnp.asarray(False),
            jnp.zeros(n_d, jnp.float32),
            jnp.zeros(m_rows, jnp.float32),
            key,
        )
        masks = (jnp.asarray(predict_mask), jnp.asarray(control_mask))
        _, rec = jax.lax.scan(body, init, masks)
        return rec

    return jax.jit(run), ts
