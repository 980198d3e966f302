"""PF closed-loop quality/cost frontier: ITSE vs real-time utilization,
ITSE vs energy, and filter-covariance convergence vs N.

Re-creation of
/root/reference/results/pf_closedloop/bioreactor_performance_pf.py.
"""
import time

import numpy as np

from gpu_se_tpu import sim
from gpu_se_tpu.utils import PickleJar
from results._common import save_fig

N_LOG2 = np.arange(2, 21, 2.0)
DT_CONTROL = 0.1


@PickleJar.pickle(path="pf/closedloop")
def get_sim_summary(N_particles, dt_control, dt_predict, monte_carlo=0, end_time=50):
    """Run one closed-loop simulation; summarize quality and runtimes
    (cf. bioreactor_performance_pf.py:20-57 in the reference)."""
    s = sim.Simulation(
        int(N_particles), dt_control, dt_predict, end_time, pf=True,
        seed=monte_carlo,
    )
    t0 = time.perf_counter()
    s.simulate()
    runtime = time.perf_counter() - t0
    return dict(
        performance=float(s.performance),
        mpc_frac=float(s.mpc_frac),
        predict_count=s.predict_count,
        update_count=s.update_count,
        runtime=runtime,
        covariance_point_size=np.asarray(s.covariance_point_size),
        ts=s.ts,
    )


def utilization(summary, dt_control=DT_CONTROL):
    """Runtime / real-time budget (budget = dt_control * 60 s,
    cf. bioreactor_performance_pf.py:157)."""
    budget = (summary["predict_count"] + summary["update_count"]) and (
        len(summary["ts"]) * 0 + dt_control * 60
    )
    total_budget = summary["ts"][-1] / dt_control * (dt_control * 60)
    return summary["runtime"] / total_budget


def frontier(log2s=N_LOG2, dt_control=DT_CONTROL, end_time=50):
    rows = []
    for log2 in log2s:
        n = int(2**log2)
        s = get_sim_summary(n, dt_control, dt_control, 0, end_time)
        rows.append((n, s["performance"], utilization(s, dt_control)))
    return np.array(rows)


def plot(log2s=N_LOG2):
    import matplotlib.pyplot as plt

    rows = frontier(log2s)
    fig, axes = plt.subplots(1, 3, figsize=(18, 5))
    axes[0].semilogx(rows[:, 0], rows[:, 1], "k.-")
    axes[0].set_xlabel("N particles"); axes[0].set_ylabel("ITSE")
    axes[1].loglog(rows[:, 0], rows[:, 2], "k.-")
    axes[1].axhline(1.0, color="red")
    axes[1].set_xlabel("N particles"); axes[1].set_ylabel("utilization")
    # covariance convergence vs N (cf. reference :238-271)
    for log2 in log2s[:: max(1, len(log2s) // 4)]:
        n = int(2**log2)
        s = get_sim_summary(n, DT_CONTROL, DT_CONTROL, 0, 50)
        axes[2].semilogy(s["ts"], s["covariance_point_size"], label=f"N=2^{int(log2)}")
    axes[2].set_xlabel("t (min)"); axes[2].set_ylabel(r"max $\sigma$(cov)")
    axes[2].legend()
    return save_fig("bioreactor_performance_pf.png")


if __name__ == "__main__":
    plot()
