"""Shared setup for experiment scripts (thesis-figure layer).

Mirrors the conventions of /root/reference/results/: every script exposes
``simulate()``/``*_run_seq()``/``plot()`` entry points; expensive results
are PickleJar-cached; plots render headless to ``results/figures/``.
"""
from __future__ import annotations

import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

FIG_DIR = os.path.join(_REPO, "results", "figures")
os.makedirs(FIG_DIR, exist_ok=True)


def save_fig(name: str):
    path = os.path.join(FIG_DIR, name)
    plt.savefig(path, bbox_inches="tight", dpi=120)
    plt.close("all")
    print(f"figure -> {path}")
    return path


def openloop_staged_run(end_time, schedule, X0, noisy=True, clear_at=25.0,
                        high_N=True, seed=0):
    """Generic staged open-loop bioreactor run.

    ``schedule``: list of ``(t_end, u)`` stages; the state partial-zero +
    regime switch happens at ``clear_at`` (cf.
    /root/reference/results/bioreactor_openloop/batch_production_growth.py:34-47).
    """
    import jax

    from gpu_se_tpu import sim
    from gpu_se_tpu.models import Bioreactor

    ts = np.linspace(0, end_time, int(end_time * 10))
    dt = ts[1]
    reactor = Bioreactor(X0=np.array(X0, dtype=float), high_N=high_N)
    state_pdf, measurement_pdf = sim.get_noise()
    state_pdf._key = jax.random.PRNGKey(seed + 11)
    measurement_pdf._key = jax.random.PRNGKey(seed + 22)
    select_outputs = [0, 2]

    us = [np.array([0.0, 0.0])]
    xs = [reactor.X.copy()]
    ys = [reactor.outputs(us[-1])]
    ys_meas = [reactor.outputs(us[-1])]

    not_cleared = True
    for t in ts[1:]:
        u = schedule[-1][1]
        for t_end, u_stage in schedule:
            if t < t_end:
                u = u_stage
                break
        if t >= clear_at and not_cleared:
            reactor.X[[0, 2, 3, 4]] = 0
            not_cleared = False
            reactor.high_N = False
        us.append(np.asarray(u, dtype=float))
        reactor.step(dt, us[-1])
        if noisy:
            reactor.X = reactor.X + np.asarray(state_pdf.draw(), float).squeeze()
        outputs = reactor.outputs(us[-1])
        ys.append(outputs.copy())
        if noisy:
            outputs = outputs.copy()
            outputs[select_outputs] += np.asarray(measurement_pdf.draw(), float).squeeze()
        ys_meas.append(outputs)
        xs.append(reactor.X.copy())

    return ts, np.array(us), np.array(xs), np.array(ys), np.array(ys_meas)
