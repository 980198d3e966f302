"""GSF closed-loop quality/cost frontier (twin of the PF version; the
covariance-convergence panel runs longer, cf.
/root/reference/results/gsf_closedloop/bioreactor_performance_gsf.py:242-248).
"""
import time

import numpy as np

from gpu_se_tpu import sim
from gpu_se_tpu.utils import PickleJar
from results._common import save_fig

N_LOG2 = np.arange(1, 15, 2.0)
DT_CONTROL = 0.1


@PickleJar.pickle(path="gsf/closedloop")
def get_sim_summary(N_particles, dt_control, dt_predict, monte_carlo=0, end_time=50):
    s = sim.Simulation(
        int(N_particles), dt_control, dt_predict, end_time, pf=False,
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


@PickleJar.pickle(path="gsf/closedloop_device")
def get_sim_summary_device(N_particles, dt_control, dt_predict,
                           monte_carlo=0, end_time=50):
    """Device-speed twin of :func:`get_sim_summary` via the fused
    on-device ``lax.scan`` loop with the GSUKF core (VERDICT r3 weak #5;
    see the PF version for the timing-honesty protocol)."""
    import jax
    import jax.numpy as jnp

    from gpu_se_tpu.filters import gs_ukf
    from gpu_se_tpu.models import bioreactor as bio
    from gpu_se_tpu.sim.loop import make_scan_loop

    bioreactor, lin_model, K, est = sim.get_parts(
        dt_control, int(N_particles), gpu=True, pf=False, seed=monte_carlo,
    )
    state_pdf, measurement_pdf = sim.get_noise()
    run, ts = make_scan_loop(
        K, lin_model, state_pdf.dist, measurement_pdf.dist,
        end_time=end_time, dt_control=dt_control, dt_predict=dt_predict,
        filter_core=gs_ukf,
    )

    def forced(state, x0, key):
        rec = run(state, x0, key)
        force = sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in rec)
        return rec, force

    forced = jax.jit(forced)
    null = jax.jit(lambda: jnp.float32(0.0))
    x0 = np.asarray(bioreactor.X, dtype=np.float32)
    key = jax.random.PRNGKey(int(monte_carlo) + 1)

    rec, f0 = forced(est.state, x0, key)
    float(f0)
    float(null())
    # Timed call must NOT be byte-identical to the warm-up: the relay
    # replay-caches identical (executable, inputs) calls across processes
    # (CLAUDE.md timing minefield #1). Seed it from the wall clock.
    timed_key = jax.random.PRNGKey(int(time.time_ns()) % (2**31 - 1))
    t0 = time.perf_counter()
    _, f1 = forced(est.state, x0, timed_key)
    float(f1)
    t1 = time.perf_counter()
    float(null())
    t2 = time.perf_counter()
    runtime = max((t1 - t0) - (t2 - t1), 0.0)

    xs = np.asarray(rec.xs)
    xs_f = np.asarray(rec.xs_f)
    ys = np.asarray(jax.vmap(bio.all_outputs)(jnp.asarray(xs)))
    ys_f = np.asarray(jax.vmap(bio.all_outputs)(jnp.asarray(xs_f)))
    sel = np.asarray(lin_model.outputs, dtype=int)
    perf = sim.performance(ys[:, sel], ys_f[:, sel], ts[1:])
    status = np.asarray(rec.status)
    return dict(
        performance=float(perf),
        mpc_frac=float(np.mean(status == 1)),
        runtime=float(runtime),
        runtime_raw=float(t1 - t0),
        null_rtt=float(t2 - t1),
        ts=ts,
    )


def frontier_device(log2s=N_LOG2, dt_control=DT_CONTROL, end_time=50):
    rows = []
    for log2 in log2s:
        n = int(2**log2)
        s = get_sim_summary_device(n, dt_control, dt_control, 0, end_time)
        rows.append((n, s["performance"], s["runtime"] / (s["ts"][-1] * 60.0)))
    return np.array(rows)


def frontier(log2s=N_LOG2, dt_control=DT_CONTROL, end_time=50):
    rows = []
    for log2 in log2s:
        n = int(2**log2)
        s = get_sim_summary(n, dt_control, dt_control, 0, end_time)
        budget = s["ts"][-1] / dt_control * (dt_control * 60)
        rows.append((n, s["performance"], s["runtime"] / budget))
    return np.array(rows)


def plot(log2s=N_LOG2):
    import matplotlib.pyplot as plt

    rows = frontier(log2s)
    fig, axes = plt.subplots(1, 3, figsize=(18, 5))
    axes[0].semilogx(rows[:, 0], rows[:, 1], "k.-")
    axes[0].set_xlabel("N Gaussians"); axes[0].set_ylabel("ITSE")
    axes[1].loglog(rows[:, 0], rows[:, 2], "k.-",
                   label="host shell (relay RTT bound)")
    try:
        drows = frontier_device(log2s)
        axes[1].loglog(drows[:, 0], drows[:, 2], "b.-",
                       label="on-device scan loop")
    except Exception as e:  # pragma: no cover - device path optional
        print("device frontier unavailable:", e)
    axes[1].axhline(1.0, color="red")
    axes[1].legend(fontsize=8)
    axes[1].set_xlabel("N Gaussians"); axes[1].set_ylabel("utilization")
    for log2 in log2s[:: max(1, len(log2s) // 4)]:
        n = int(2**log2)
        s = get_sim_summary(n, DT_CONTROL, DT_CONTROL, 0, 50)
        axes[2].semilogy(s["ts"], s["covariance_point_size"], label=f"N=2^{int(log2)}")
    axes[2].set_xlabel("t (min)"); axes[2].legend()
    return save_fig("bioreactor_performance_gsf.png")


if __name__ == "__main__":
    plot()
