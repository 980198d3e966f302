"""Probe relay runtime behavior:
w1 chained trivial program (x+1) on 20MB          -> pure per-call floor
w2 alternating two trivial programs (x+1, x*2)    -> program-switch cost
w3 fused step with donate_argnums=0               -> donation effect
w4 fused step, output only particles (no state)   -> output-liveness effect
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
from results._filter_bench import rig_dists  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402

N = 2 ** 20
REPS = 30


def bench_arr(name, fn, x):
    for rnd in range(2):
        y = x
        t0 = time.perf_counter()
        for _ in range(REPS):
            y = fn(y)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:46s} {dt:8.3f} ms (round1)", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    x = jnp.ones((N, 5), jnp.float32)

    add1 = jax.jit(lambda a: a + 1.0)
    mul2 = jax.jit(lambda a: a * 0.5)

    bench_arr("w1 chained trivial (x+1)", add1, x)

    def alt(a):
        return mul2(add1(a))

    bench_arr("w2 alternating trivial pair", alt, x)

    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    dt_ = jnp.float32(0.1)

    def _step(s):
        return pf_core.step(s, u, z, dt_, f, g, state_pdf, meas_pdf)

    step_donate = jax.jit(_step, donate_argnums=0)

    state = pf_core.init(jax.random.PRNGKey(0), N, x0)

    for rnd in range(2):
        s = state
        t0 = time.perf_counter()
        for _ in range(REPS):
            s = step_donate(s)
        jax.block_until_ready(s.particles)
        dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{'w3 fused step, donated':46s} {dt:8.3f} ms (round1)", flush=True)


if __name__ == "__main__":
    main()
