"""Bisect why jitted pf_core.resample is ~17 ms when the identical
systematic_resample body benches at ~1 ms (scripts/bench_gather.py)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gpu_se_tpu.filters import particle as pf_core  # noqa: E402
from gpu_se_tpu.filters.particle import PFState  # noqa: E402
from gpu_se_tpu.filters.resampling import systematic_resample  # noqa: E402

N = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
REPS = 20


def bench(name, fn, state):
    s = fn(state)
    jax.block_until_ready(s.particles)
    t0 = time.perf_counter()
    for _ in range(REPS):
        s = fn(s)
    jax.block_until_ready(s.particles)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:40s} {dt:8.3f} ms", flush=True)


@jax.jit
def g1_exact(state):
    return pf_core.resample(state)


@jax.jit
def g2_const_key(state):
    parts, w = systematic_resample(
        state.particles, state.weights, jax.random.PRNGKey(0)
    )
    return PFState(particles=parts, weights=w, key=state.key)


@jax.jit
def g3_traced_key_no_split(state):
    parts, w = systematic_resample(state.particles, state.weights, state.key)
    return PFState(particles=parts, weights=w, key=state.key)


@jax.jit
def g4_varying_weights(state):
    # like g1 but weights rebuilt from particles so they are not the
    # constant 1/N that chained resamples otherwise produce
    w = 1.0 + 0.1 * jnp.tanh(state.particles[:, 0])
    key, sub = jax.random.split(state.key)
    parts, w = systematic_resample(state.particles, w, sub)
    return PFState(particles=parts, weights=w, key=key)


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    key = jax.random.PRNGKey(0)
    parts = jax.random.normal(key, (N, 5), jnp.float32)
    state = PFState(
        particles=parts, weights=jnp.full((N,), 1.0 / N), key=jax.random.PRNGKey(1)
    )
    bench("g2 const key (r folded)", g2_const_key, state)
    bench("g3 traced key, no split", g3_traced_key_no_split, state)
    bench("g4 split + data weights", g4_varying_weights, state)
    bench("g1 pf_core.resample exact", g1_exact, state)


if __name__ == "__main__":
    main()
