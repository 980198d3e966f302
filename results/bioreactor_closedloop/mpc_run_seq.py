"""MPC latency benchmark: closed-loop K.step timings at dt_control=0.1
(P=3000, M=2000), with the run-sequence/pacf methodology.

Re-creation of /root/reference/results/bioreactor_closedloop/mpc_run_seq.py.
"""
import time

import numpy as np

from gpu_se_tpu import sim
from gpu_se_tpu.utils import PickleJar, max_abs_pacf
from results._common import save_fig


@PickleJar.pickle(path="bioreactor/mpc_run_seq")
def mpc_run_seq(n_runs=1000, dt_control=0.1):
    """Wall-clock times of ``n_runs`` warm-started closed-loop MPC solves
    (cf. mpc_run_seq.py:20-79 in the reference)."""
    end_time = 50
    ts = np.linspace(0, end_time, int(end_time * 10))
    dt = ts[1]
    bioreactor, lin_model, K, _ = sim.get_parts(dt_control=dt_control)

    us = [np.array([0.06, 0.2])]
    xs = [bioreactor.X.copy()]
    ys = [bioreactor.outputs(us[-1])]

    times = []
    while len(times) < n_runs:
        for t in ts[1:]:
            u_temp = us[-1].copy()
            t0 = time.perf_counter()
            try:
                u = K.step(
                    lin_model.xn2d(xs[-1]),
                    lin_model.un2d(us[-1]),
                    lin_model.yn2d(ys[-1]),
                )
            except ValueError:
                u = np.array([0.06, 0.2]) - lin_model.u_bar
            times.append(time.perf_counter() - t0)
            u_temp[lin_model.inputs] = lin_model.ud2n(u)
            us.append(u_temp.copy())
            bioreactor.step(dt, us[-1])
            ys.append(bioreactor.outputs(us[-1]))
            xs.append(bioreactor.X.copy())
            if len(times) >= n_runs:
                break
    return np.array(times)


def plot(n_runs=1000):
    import matplotlib.pyplot as plt

    times = mpc_run_seq(n_runs)
    times = times[1:]  # drop the compile call
    print(f"median MPC solve: {np.median(times) * 1000:.2f} ms")
    print(f"max |pacf|: {max_abs_pacf(times):.3f} (gate: < 0.2)")
    fig, axes = plt.subplots(1, 2, figsize=(12.5, 5))
    axes[0].plot(times * 1000, "k.", markersize=2)
    axes[0].set_xlabel("run"); axes[0].set_ylabel("solve time (ms)")
    axes[1].plot(times[:-1] * 1000, times[1:] * 1000, "k.", markersize=2)
    axes[1].set_xlabel("run i (ms)"); axes[1].set_ylabel("run i+1 (ms)")
    return save_fig("mpc_run_seq.png")


if __name__ == "__main__":
    plot()
