"""Produce results/artifacts/MPC_LATENCY.json: device-side QP solve time
(calibrated scan slope, scalar-forced completion — the shared
implementation in results/bioreactor_closedloop/mpc_run_seq.py) vs the
end-to-end K.step latency through the relay.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

from gpu_se_tpu.utils import max_abs_pacf  # noqa: E402
import results.bioreactor_closedloop.mpc_run_seq as mrs  # noqa: E402


def main():
    dev_ms, iters = mrs.device_solve_ms(dt_control=0.1, k1=2, k2=10, reps=3)
    print(f"device: {dev_ms:.2f} ms/solve, cold-start iters {iters:.0f}",
          flush=True)
    times = mrs.mpc_run_seq(n_runs=120, dt_control=0.1)[1:]
    art = {
        "P": 3000, "M": 2000, "dt_control": 0.1,
        "device_solve_ms": round(float(dev_ms), 3),
        "device_solves_per_s": round(1e3 / max(float(dev_ms), 1e-6), 1),
        "cold_start_admm_iterations": int(iters),
        "end_to_end_step_ms_median": round(float(np.median(times) * 1e3), 3),
        "end_to_end_steps_per_s": round(1e3 / float(np.median(times) * 1e3), 1),
        "max_abs_pacf": round(float(max_abs_pacf(times)), 3),
        "n_runs": len(times),
        "note": "device_solve_ms: (T(k2)-T(k1))/(k2-k1) over warm-started solve "
                "scans, scalar-forced completion, wall-clock-seeded x0; the "
                "end-to-end gap is host float64 prep + relay round-trip",
    }
    os.makedirs("/root/repo/results/artifacts", exist_ok=True)
    with open("/root/repo/results/artifacts/MPC_LATENCY.json", "w") as fh:
        json.dump(art, fh, indent=1)
    print(json.dumps(art), flush=True)


if __name__ == "__main__":
    main()
