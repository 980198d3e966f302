"""Experiment campaign, TPU leg: run-sequence benchmarks (CPU + TPU legs
of each), power memos, closed-loop frontiers, MPC run-seq — producing the
remaining thesis figures + picklejar memos on the real chip.

Run detached: nohup python scripts/campaign_tpu.py & (hours of compiles
on first run; everything PickleJar-cached afterwards).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402


def run(label, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"[campaign-tpu] {label}: OK ({time.time() - t0:.0f}s) -> {out}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        print(f"[campaign-tpu] {label}: FAIL {type(e).__name__}: {e}", flush=True)


def main():
    only = set(sys.argv[1:]) or None

    def want(name):
        return only is None or name in only

    if want("pf_run_seq"):
        from results.pf_openloop import pf_run_seq

        run("pf_run_seq.plot(30)", lambda: pf_run_seq.plot(runs=30))
        run("pf_run_seq.plot_breakdown(2^18, 20)",
            lambda: pf_run_seq.plot_breakdown(n=2 ** 18, runs=20))
        run("pf_run_seq.pacf_gate(30)",
            lambda: [(n, round(v, 3)) for _, n, v in pf_run_seq.pacf_gate(30)][-4:])

    if want("gsf_run_seq"):
        from results.gsf_openloop import gsf_run_seq

        run("gsf_run_seq.plot(30)", lambda: gsf_run_seq.plot(runs=30))

    if want("power"):
        from results.pf_openloop import pf_power
        from results.gsf_openloop import gsf_power

        run("pf_power.plot(3.0)", lambda: pf_power.plot(t_run=3.0))
        run("gsf_power.plot(3.0)", lambda: gsf_power.plot(t_run=3.0))

    if want("frontier"):
        from results.pf_closedloop import bioreactor_performance_pf as pf_cl
        from results.gsf_closedloop import bioreactor_performance_gsf as gsf_cl

        # reduced N grids; dt_control=0.1 keeps the reference's P=3000 QP
        run("pf frontier plot", lambda: pf_cl.plot(np.arange(4, 21, 4.0)))
        run("gsf frontier plot", lambda: gsf_cl.plot(np.arange(2, 15, 3.0)))

    if want("mpc"):
        from results.bioreactor_closedloop import mpc_run_seq

        run("mpc_run_seq.plot(300)", lambda: mpc_run_seq.plot(n_runs=300))


if __name__ == "__main__":
    main()
