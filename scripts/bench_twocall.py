"""Candidate fixes for the in-context scatter/gather slowdown:
v1 two-dispatch step (predict+update | resample as separate programs)
v2 one program, index via sort-based searchsorted (no scatter)
v3 one program, current formulation (baseline 15.5 ms)"""
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
from gpu_se_tpu.filters.resampling import sorted_row_gather  # noqa: E402
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
    print(f"{name:46s} {dt:8.3f} ms (round1)", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    dt_ = jnp.float32(0.1)

    @jax.jit
    def pred_upd(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        return pf_core.update(s, u, z, g, meas_pdf)

    @jax.jit
    def resample_only(s):
        return pf_core.resample(s)

    def v1_two_dispatch(s):
        return resample_only(pred_upd(s))

    def searchsorted_tail(s):
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        cs = jnp.cumsum(s.weights)
        cs = cs / cs[-1]
        upos = (jnp.arange(N, dtype=jnp.float32) + r) / N
        idx = jnp.clip(
            jnp.searchsorted(cs, upos, side="left", method="sort"), 0, N - 1
        ).astype(jnp.int32)
        idx = jax.lax.optimization_barrier(idx)
        parts = sorted_row_gather(s.particles, idx)
        return pf_core.PFState(
            particles=parts, weights=jnp.full((N,), 1.0 / N, jnp.float32), key=key
        )

    @jax.jit
    def v2_sortsearch(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        s = pf_core.update(s, u, z, g, meas_pdf)
        return searchsorted_tail(s)

    @jax.jit
    def v3_current(s):
        return pf_core.step(s, u, z, dt_, f, g, state_pdf, meas_pdf)

    state = pf_core.init(jax.random.PRNGKey(0), N, x0)
    bench("v1 two-dispatch step", v1_two_dispatch, state)
    bench("v2 fused, sort-searchsorted", v2_sortsearch, state)
    bench("v3 fused, current (baseline)", v3_current, state)


if __name__ == "__main__":
    main()
