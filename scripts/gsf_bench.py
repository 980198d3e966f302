"""GSUKF headline benchmark at reference scale -> GSF_BENCH.json.

The reference exercises the GSF to 2^18.5 Gaussians
(/root/reference/results/gsf_openloop/gsf_run_seq.py:483-497) but
publishes no numbers. This records the TPU chained-loop throughput of
the fused GSUKF step at 2^18 with the same honesty methodology as
bench.py (wall-clock seed, chained state, terminal block), alongside
the calibrated device time from CALIBRATED_OPS.json when present.

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/gsf_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 2**18
REPS = 30


def main():
    from results._filter_bench import rig_dists
    from gpu_se_tpu.filters import gs_ukf
    from gpu_se_tpu.models import bioreactor as bio

    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)

    seed = int(time.time() * 1000) % (2**31)  # fresh chain every run
    state = gs_ukf.init(jax.random.PRNGKey(seed), N, x0, state_pdf)

    @jax.jit
    def step(state):
        return gs_ukf.step(state, u, z, jnp.float32(0.1), f, g,
                           state_pdf, meas_pdf)

    state = step(state)
    jax.block_until_ready(state.means)

    t0 = time.perf_counter()
    for _ in range(REPS):
        state = step(state)
    jax.block_until_ready(state.means)
    steps_per_s = REPS / (time.perf_counter() - t0)

    # k-chain slope (round-3 method of record, CLAUDE.md): in-jit chain
    # of k dependent steps, (T(9)-T(1))/8 cancels the sync RTT. The
    # round-2 "1.8 ms calibrated" rested on 7 nets under 10% of the
    # null RTT (ADVICE r2); this supersedes it.
    m0 = jnp.asarray(state.means)

    def chain(k):
        @jax.jit
        def run(m_, eps):
            st = gs_ukf.GSUKFState(
                means=m_ + eps * 1e-9,
                covariances=jnp.broadcast_to(
                    jnp.eye(5, dtype=jnp.float32) * 1e-4, (N, 5, 5)),
                weights=jnp.full((N,), 1.0 / N, jnp.float32),
                key=jax.random.PRNGKey(
                    jnp.abs(eps * 1e6).astype(jnp.int32)),
            )
            for _ in range(k):
                st = gs_ukf.step(st, u, z, jnp.float32(0.1), f, g,
                                 state_pdf, meas_pdf)
            return jnp.sum(st.means, dtype=jnp.float32)
        return run

    rng = np.random.default_rng(seed)

    def measure(fn, calls=12):
        float(fn(m0, jnp.float32(rng.standard_normal())))
        ts = []
        for _ in range(calls):
            eps = jnp.float32(rng.standard_normal())
            t0 = time.perf_counter()
            float(fn(m0, eps))
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(ts))

    t_lo, t_hi = measure(chain(1)), measure(chain(9))
    slope_ms = round((t_hi - t_lo) / 8.0, 3)
    print(f"gsf slope: T(1)={t_lo:.2f} T(9)={t_hi:.2f} -> {slope_ms} "
          f"ms/step", flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {
        "metric": f"gsukf_full_step_throughput_2^18_gaussians",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "method": "chained loop, wall-clock seed, terminal block "
                  f"({REPS} reps); relay-RTT amortized via queue "
                  "backpressure (CLAUDE.md)",
        "device_ms_slope": slope_ms,
        "slope_method": "in-jit chain of k dependent steps, "
                        "(T(9)-T(1))/8, median of 12 calls",
        "device_ms_calibrated": None,
        "reference_scale": "gsf_run_seq.py:483-497 exercises 2^0..2^18.5, "
                           "no published numbers",
    }
    cal_path = os.path.join(root, "results", "artifacts", "CALIBRATED_OPS.json")
    if os.path.exists(cal_path):
        with open(cal_path) as fh:
            cal = json.load(fh)
        out["device_ms_calibrated"] = (
            cal.get("gsf_full_step_2e18", {}).get("device_ms")
        )

    path = os.path.join(root, "results", "artifacts", "GSF_BENCH.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    print("->", path)


if __name__ == "__main__":
    main()
