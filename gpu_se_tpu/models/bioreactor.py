"""Bioreactor (CSTR) process model — 5-state fumaric-acid fermenter.

States ``[Cg, Cx, Cfa, Ce, Ch]`` (glucose, biomass, fumaric acid, ethanol,
H+-proxy, mol/L), inputs ``[Fg_in, Fm_in]`` (feed rates, L/min). Two
regimes: a high-nitrogen growth phase driven by a 5x5 stoichiometric rate
matrix, and a low-nitrogen production phase (``homeostatic_des``).

Numerics match /root/reference/model/BioreactorModel.py:7-253 exactly; the
architecture differs: the regime equations are pure functions over
``(x, u)`` parameterized by the array module, so the *same* code serves
the host plant loop (numpy), JAX transforms (vmap/jit for the particle
filter's per-particle ``f``/``g``), and exact linearization via
``jax.jacfwd`` — replacing the reference's numba-CUDA "static function"
compilation channel (/root/reference/filter/particle.py:176-208).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.optimize

from gpu_se_tpu.models.base import NonlinearModel

# Molar masses of [glucose, biomass, fumaric acid, ethanol, H+] (g/mol)
# cf. /root/reference/model/BioreactorModel.py:120
MOLAR_MASSES = np.array([180.0, 24.6, 116.0, 46.0, 1.0])

_GAMMA, _BETA = 1.8, 0.1
# Stoichiometric rate matrix for the high-N growth regime
# cf. /root/reference/model/BioreactorModel.py:34-38
_RATE_MATRIX = np.array(
    [
        [1, 0, 0, 0, 0],
        [0, 0, 0, 1, 0],
        [0, 0, 0, 0, 1],
        [-6, 4, 7 / 3, 2, -6 * _GAMMA],
        [0, 12, -1, 0, 6 * _BETA],
    ]
)
_RATE_MATRIX_INV = np.linalg.inv(_RATE_MATRIX)


def homeostatic_des(x, u, dt=1.0, xp=jnp):
    """Low-nitrogen production-phase state deltas, ``dx = f(x, u) * dt``.

    Pure elementwise math (min/max only) — vmap/jit-safe. Follows the
    delta convention of the reference filters: the returned value is the
    state *change* over ``dt``, premultiplied by ``dt``
    (cf. /root/reference/model/BioreactorModel.py:170-231 and the
    ``x += f(x, u, dt)`` call at /root/reference/filter/particle.py:66).

    Parameters
    ----------
    x : (5,) array — current state
    u : (2,) array — inputs [Fg_in, Fm_in]
    dt : scalar — Euler step premultiplier
    xp : array module (jnp for traced code, np for the host plant)
    """
    Cg, Cx, Cfa, Ce, Ch = x[0], x[1], x[2], x[3], x[4]
    Cg = xp.maximum(Cg, 0.0)
    Cx = xp.maximum(Cx, 0.0)
    Cfa = xp.maximum(Cfa, 0.0)
    Ce = xp.maximum(Ce, 0.0)

    Fg_in, Fm_in = u[0], u[1]
    Cg_in = 5000.0 / 180.0
    F_out = Fg_in + Fm_in

    V = 1.0  # L

    rX = 0.0 * Cx
    rH = 280.0 / 180.0 - Cg

    # (molFA/min) = (gFA/gX/min)(molFA/gFA)(molX/Lv)(gX/molX)(Lv)
    rFA_max = 0.25 / 116.0 * Cx * 24.6 * V
    rFA = rFA_max * (Cg / (1e-2 + Cg))

    r_theta1_max = (0.4 - 0.25) / 180.0 * Cx * 24.6 * V
    r_theta1_req = r_theta1_max - (
        r_theta1_max / 2000.0 / (0.28 / 180.0) * rH + 0.01 * Ch
    )
    r_theta1 = xp.minimum(r_theta1_max, xp.maximum(0.0, r_theta1_req)) * (
        Cg / (1e-2 + Cg)
    )

    r_E_max = 0.025 / 46.0 * Cx * 24.6 * V
    rE_req = r_theta1_req - r_theta1_max
    rE = xp.minimum(r_E_max, xp.maximum(0.0, rE_req))

    r_theta2_max = (0.1 - 0.025) / 180.0 * Cx * 24.6 * V
    r_theta2_req = r_theta1_req - r_theta1_max - rE
    r_theta2 = xp.minimum(r_theta2_max, xp.maximum(0.0, r_theta2_req))

    rG = -rFA * (116.0 / 180.0) - r_theta1 - rE * (46.0 / 180.0) - r_theta2

    dCg = (Fg_in * Cg_in - F_out * Cg + rG) / V * dt
    dCx = rX / V * dt
    dCfa = (-F_out * Cfa + rFA) / V * dt
    dCe = (-F_out * Ce + rE) / V * dt
    dCh = rH / V * dt

    return xp.stack([dCg, dCx, dCfa, dCe, dCh])


def high_n_des(x, u, xp=jnp):
    """High-nitrogen growth-phase state derivatives dx/dt.

    Monod-type rates solved through the stoichiometric matrix inverse
    (cf. /root/reference/model/BioreactorModel.py:70-89).
    """
    Cg = xp.maximum(x[0], 0.0)
    Cx = xp.maximum(x[1], 0.0)
    Cfa = xp.maximum(x[2], 0.0)
    Ce = xp.maximum(x[3], 0.0)

    Fg_in, Fm_in = u[0], u[1]
    Cg_in = 5000.0 / 180.0
    F_out = Fg_in + Fm_in
    V = 1.0

    monod = Cg / (1.0 + Cg)
    rhs = xp.stack(
        [monod / 230.0, monod / 12.0, monod / 21.0, 1.1 * monod, 0.0 * monod]
    )
    rFAf, rTCA, rResp, rEf, rX = tuple(
        xp.asarray(_RATE_MATRIX_INV) @ rhs
    )

    rG = (-rFAf - rTCA - rEf - rX) * Cx * V
    rXs = 6.0 * rX * Cx * V
    rFA = 2.0 * rFAf * Cx * V
    rE = 2.0 * rEf * Cx * V

    dCg = (Fg_in * Cg_in - F_out * Cg + rG) / V
    dCx = rXs / V
    dCfa = (-F_out * Cfa + rFA) / V
    dCe = (-F_out * Ce + rE) / V
    dCh = 0.0 * Cg
    return xp.stack([dCg, dCx, dCfa, dCe, dCh])


def static_outputs(x, u, xp=jnp):
    """Measurement function: masses of glucose and fumaric acid (mg/L).

    cf. /root/reference/model/BioreactorModel.py:233-253.
    """
    del u
    return xp.stack([x[0] * 180.0, x[2] * 116.0])


def all_outputs(x, xp=jnp):
    """All states scaled to mass concentrations (g/mol molar masses)."""
    return x * xp.asarray(MOLAR_MASSES)


def euler_step(x, u, dt, high_n=False, xp=jnp):
    """One explicit-Euler plant step with the reference's >=0 clip on the
    first four states (cf. /root/reference/model/BioreactorModel.py:106-109)."""
    if high_n:
        dx = high_n_des(x, u, xp=xp) * dt
    else:
        dx = homeostatic_des(x, u, dt, xp=xp)
    x_new = x + dx
    clipped = xp.maximum(x_new[:4], 0.0)
    if xp is jnp:
        return x_new.at[:4].set(clipped)
    x_new[:4] = clipped
    return x_new


class Bioreactor(NonlinearModel):
    """Stateful bioreactor shell over the pure regime functions.

    Same constructor surface as the reference
    (/root/reference/model/BioreactorModel.py:29-40).
    """

    def __init__(self, X0, t=0.0, high_N=True):
        self.X = np.array(X0, dtype=float)
        self.t = float(t)
        self.high_N = high_N

    def DEs(self, inputs):
        u = np.asarray(inputs, dtype=float)
        if self.high_N:
            return high_n_des(self.X, u, xp=np)
        return homeostatic_des(self.X, u, 1.0, xp=np)

    def step(self, dt, inputs):
        self.t += dt
        self.X = self.X + self.DEs(inputs) * dt
        self.X[:4] = np.maximum(self.X[:4], 0.0)

    def outputs(self, inputs):
        del inputs
        return self.X * MOLAR_MASSES

    def raw_outputs(self, inputs):
        del inputs
        return self.X

    # Pure hooks for the linearizer (low-N regime, matching the rig at
    # /root/reference/sim_base.py:46-66 which linearizes the high_N=False
    # plant).
    def des(self, x, u):
        if self.high_N:
            return high_n_des(x, u, xp=jnp)
        return homeostatic_des(x, u, 1.0, xp=jnp)

    def out(self, x, u):
        del u
        return all_outputs(x, xp=jnp)

    # ------------------------------------------------------------------
    @staticmethod
    def homeostatic_DEs(x, u, dt=1.0):
        """Reference-named alias (jnp backend) for filter ``f``."""
        return homeostatic_des(x, u, dt, xp=jnp)

    @staticmethod
    def static_outputs(x, u):
        """Reference-named alias (jnp backend) for filter ``g``."""
        return static_outputs(x, u, xp=jnp)

    @staticmethod
    def find_SS(U_op, X0):
        """Steady state of the low-N regime near ``X0`` with biomass
        ``X0[1]`` held fixed (cf. /root/reference/model/BioreactorModel.py:137-168).
        """
        U_op = np.asarray(U_op, dtype=float)
        X0 = np.asarray(X0, dtype=float)

        def fun(x_ss):
            x = np.array(x_ss, dtype=float)
            x[1] = X0[1]
            return homeostatic_des(x, U_op, 1.0, xp=np)

        res = scipy.optimize.fsolve(fun, X0)
        res = np.asarray(res, dtype=float)
        res[1] = X0[1]
        return res
