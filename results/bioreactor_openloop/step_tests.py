"""Input step-test grid: 7 x 7 grid of scaled inputs, max output slope.

Re-creation of /root/reference/results/bioreactor_openloop/step_tests.py:
percents 0.5..1.5 on u = [0.06, 0.2], PickleJar-cached runs, and the
maximum C_G slope statistic used for sampling-period selection.
"""
import itertools

import numpy as np

from gpu_se_tpu import sim
from gpu_se_tpu.utils import PickleJar
from results._common import save_fig

PERCENTS = np.array([0.5, 0.7, 0.8, 1, 1.2, 1.3, 1.5])


@PickleJar.pickle(path="bioreactor")
def step_test(percent, dt):
    """Open-loop response to a scaled constant input
    (cf. step_tests.py:12-45 in the reference)."""
    end_time = 300
    ts = np.linspace(0, end_time, int(end_time // dt))
    bioreactor, lin_model, _, _ = sim.get_parts()
    u = np.array([0.06, 0.2]) * np.asarray(percent)
    ys = [bioreactor.outputs(u)]
    for _ in ts[1:]:
        bioreactor.step(ts[1], u)
        ys.append(bioreactor.outputs(u).copy())
    return ts, np.array(ys)


def max_slope(dt=0.1, percents=PERCENTS):
    """Maximum |dC_G|/t over the step grid (cf. step_tests.py:63-81)."""
    best, arg = 0.0, None
    for p1, p2 in itertools.product(percents, percents):
        ts, ys = step_test((float(p1), float(p2)), dt)
        cg = ys[:, 0]
        cga = np.abs(cg - cg[0])
        i = int(np.argmax(cga))
        if ts[i] > 0:
            slope = cga[i] / ts[i]
            if slope > best:
                best, arg = slope, (p1, p2, ts[i])
    return best, arg


def plot(dt=0.1):
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, sharey="row", figsize=(12.5, 5))
    for p1, p2 in itertools.product(PERCENTS, PERCENTS):
        ts, ys = step_test((float(p1), float(p2)), dt)
        axes[0].plot(ts, ys[:, 2])
        axes[1].plot(ts, ys[:, 0])
    axes[0].set_title(r"$C_{FA}$")
    axes[1].set_title(r"$C_G$")
    slope, arg = max_slope(dt)
    print("max |dCg|/t slope:", slope, "at", arg)
    return save_fig("step_tests.png")


if __name__ == "__main__":
    plot()
