"""Attribute the GSUKF step's 15.4 ms/step (2^18, GSF_BENCH.json) via
k-chain slopes per resample impl + a no-resample leg.

Default impl routes the bank through the v1 kernel on the means leaf +
a sorted row gather for the (N,5,5) covariances; 'ends' packs all 30
columns through the block kernel; 'xla' is scatter+cummax + gathers.

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_gsf_slope.py
"""
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

from gpu_se_tpu.filters import gs_ukf, resampling  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402

N = 2**18
CALLS = 12


def main():
    from results._filter_bench import rig_dists

    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np),
                    jnp.float32)
    print(f"platform={jax.devices()[0].platform} N=2^18", flush=True)

    rng = np.random.default_rng(int(time.time() * 1000) % 2**31)
    m0 = jnp.asarray(rng.standard_normal((N, 5)) * 0.01 + x_ss, jnp.float32)
    jax.block_until_ready(m0)

    def step_noresample(st):
        st = gs_ukf.predict(st, u, jnp.float32(0.1), f, state_pdf)
        return gs_ukf.update(st, u, z, g, meas_pdf)

    def make_chain(kind, k):
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
                if kind == "nores":
                    st = step_noresample(st)
                    st = st.replace(
                        weights=jnp.full((N,), 1.0 / N, jnp.float32))
                else:
                    st = gs_ukf.step(st, u, z, jnp.float32(0.1), f, g,
                                     state_pdf, meas_pdf)
            return jnp.sum(st.means, dtype=jnp.float32)
        return run

    def measure(fn, calls=CALLS):
        float(fn(m0, jnp.float32(rng.standard_normal())))
        ts = []
        for _ in range(calls):
            eps = jnp.float32(rng.standard_normal())
            t0 = time.perf_counter()
            float(fn(m0, eps))
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(ts))

    for kind, impl in [("nores", None), ("step", None), ("step", "ends")]:
        label = kind if impl is None else f"{kind}[{impl}]"
        if kind == "step" and impl is None:
            label = "step[default bank-v4]"  # round 5: symmetric-packed
        ctx = resampling.impl(impl) if impl else None
        if ctx:
            ctx.__enter__()
        try:
            t_lo = measure(make_chain(kind, 1))
            t_hi = measure(make_chain(kind, 9))
        finally:
            if ctx:
                ctx.__exit__()
        print(f"{label:24s} T(1)={t_lo:8.2f} T(9)={t_hi:8.2f} "
              f"slope={(t_hi - t_lo) / 8:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
