"""Bisect the fused PF step: which stage addition takes 2.4 ms -> 15.5 ms?
All timings discard round 0 (relay first-loop artifact)."""
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

from gpu_se_tpu.filters import particle as pf_core  # noqa: E402
from gpu_se_tpu.filters.resampling import (  # noqa: E402
    sorted_row_gather,
    systematic_resample_indices,
)
from results._filter_bench import rig_dists  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402

N = 2 ** 20
REPS = 30


def bench(name, fn, state):
    for rnd in range(2):
        s = state
        t0 = time.perf_counter()
        for _ in range(REPS):
            s = fn(s)
        jax.block_until_ready(s.particles)
        dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:44s} {dt:8.3f} ms (round1)", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    dt_ = jnp.float32(0.1)

    @jax.jit
    def p1_predict(s):
        return pf_core.predict(s, u, dt_, f, state_pdf)

    @jax.jit
    def p2_pred_upd(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        return pf_core.update(s, u, z, g, meas_pdf)

    @jax.jit
    def p3_plus_indices(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        s = pf_core.update(s, u, z, g, meas_pdf)
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        idx = jax.lax.optimization_barrier(systematic_resample_indices(s.weights, r))
        # consume idx cheaply without the row gather
        w = jnp.full((N,), 1.0 / N, jnp.float32) + 0.0 * idx.astype(jnp.float32)
        return s.replace(weights=w, key=key)

    @jax.jit
    def p4_full(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        s = pf_core.update(s, u, z, g, meas_pdf)
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        idx = jax.lax.optimization_barrier(systematic_resample_indices(s.weights, r))
        parts = sorted_row_gather(s.particles, idx)
        w = jnp.full((N,), 1.0 / N, jnp.float32)
        return pf_core.PFState(particles=parts, weights=w, key=key)

    state = pf_core.init(jax.random.PRNGKey(0), N, x0)
    bench("p1 predict", p1_predict, state)
    bench("p2 predict+update", p2_pred_upd, state)
    bench("p3 +cumsum/scatter/scan indices", p3_plus_indices, state)
    bench("p4 +sorted gather (full)", p4_full, state)


if __name__ == "__main__":
    main()
