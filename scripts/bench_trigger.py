"""Find the minimal producer that makes the resample tail slow in-context.

Round-1 facts: standalone resample = 0.3 ms; fused with predict+update =
15.6 ms; barrier between stages does not help; weight values do not
matter (bench_subnormal q3). This probe varies the producer complexity
and the r provenance, and times a two-jit split.
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

from gpu_se_tpu.filters import particle as pf_core  # noqa: E402
from gpu_se_tpu.filters.resampling import (  # noqa: E402
    sorted_row_gather,
    systematic_resample_indices,
)
from results._filter_bench import rig_dists  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402

N = 2 ** 20
REPS = 20


def bench(name, fn, state):
    for rnd in range(2):
        s = state
        t0 = time.perf_counter()
        for _ in range(REPS):
            s = fn(s)
        jax.block_until_ready(s.particles)
        dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:52s} {dt:8.3f} ms", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    dt_ = jnp.float32(0.1)

    def tail(s, const_r=False):
        key, sub = jax.random.split(s.key)
        r = jnp.float32(0.37) if const_r else jax.random.uniform(sub, ())
        idx = jax.lax.optimization_barrier(systematic_resample_indices(s.weights, r))
        parts = sorted_row_gather(s.particles, idx)
        return pf_core.PFState(
            particles=parts, weights=jnp.full((N,), 1.0 / N, jnp.float32), key=key
        )

    @jax.jit
    def v0_tail_only(s):
        return tail(s)

    @jax.jit
    def v0c_tail_only_constr(s):
        return tail(s, const_r=True)

    @jax.jit
    def v1_trivial_producer(s):
        s = s.replace(particles=s.particles * 1.0001 + 1e-7)
        return tail(s)

    @jax.jit
    def v2_noise_producer(s):
        key, sub = jax.random.split(s.key)
        noise = state_pdf.draw(sub, (N,))
        s = s.replace(particles=s.particles + noise, key=key)
        return tail(s)

    @jax.jit
    def v3_vmapf_producer(s):
        deltas = jax.vmap(f, in_axes=(0, None, None))(s.particles, u, dt_)
        s = s.replace(particles=s.particles + deltas)
        return tail(s)

    @jax.jit
    def v4_predict(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        return tail(s)

    @jax.jit
    def v5_pred_upd(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        s = pf_core.update(s, u, z, g, meas_pdf)
        return tail(s)

    @jax.jit
    def v5c_pred_upd_constr(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        s = pf_core.update(s, u, z, g, meas_pdf)
        return tail(s, const_r=True)

    @jax.jit
    def j1_pred_upd(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        return pf_core.update(s, u, z, g, meas_pdf)

    def v6_two_jits(s):
        return v0_tail_only(j1_pred_upd(s))

    state = pf_core.init(jax.random.PRNGKey(0), N, x0)
    bench("v0 tail only", v0_tail_only, state)
    bench("v0c tail only, const r", v0c_tail_only_constr, state)
    bench("v1 trivial elementwise + tail", v1_trivial_producer, state)
    bench("v2 noise draw + tail", v2_noise_producer, state)
    bench("v3 vmap f + tail", v3_vmapf_producer, state)
    bench("v4 predict + tail", v4_predict, state)
    bench("v5 pred+upd + tail (current)", v5_pred_upd, state)
    bench("v5c pred+upd + tail, const r", v5c_pred_upd_constr, state)
    bench("v6 TWO JITS pred_upd | tail", v6_two_jits, state)


if __name__ == "__main__":
    main()
