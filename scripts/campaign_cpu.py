"""Experiment campaign, CPU leg: execute + cache the thesis experiments
that run on the host (plant sims, CPU MPC loops) and commit their
picklejar memos + figures.

Reduced-but-honest grids vs the reference (documented in results/README):
perf-vs-control-period 12 periods x 3 MC (reference: 20 x 5).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import time  # noqa: E402


def run(label, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"[campaign-cpu] {label}: OK ({time.time() - t0:.0f}s) -> {out}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[campaign-cpu] {label}: FAIL {type(e).__name__}: {e}", flush=True)


def main():
    from results.bioreactor_openloop import (
        batch_production_growth, ss2ss, step_tests,
    )
    from results.bioreactor_closedloop import (
        no_noise, with_noise, performance_vs_control_period as pvcp,
    )

    run("batch_production_growth.plot", batch_production_growth.plot)
    run("ss2ss.plot", ss2ss.plot)
    run("step_tests.plot", lambda: step_tests.plot(dt=0.1))
    run("no_noise.plot", no_noise.plot)
    run("with_noise.plot", with_noise.plot)
    run("performance_vs_control_period.plot(12,3)",
        lambda: pvcp.plot(n_periods=12, n_mc=3))


if __name__ == "__main__":
    main()
