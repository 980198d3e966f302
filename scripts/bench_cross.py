"""Cross experiment: {uniform, tanh} weights x {raw-array, PFState} graphs,
interleaved twice in one process, to find what makes resample 0.3 ms vs
16 ms on the relay TPU."""
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

from gpu_se_tpu.filters.resampling import (  # noqa: E402
    sorted_row_gather,
    systematic_resample_indices,
)

N = 2 ** 20
REPS = 20


@jax.jit
def step_tanh(parts, k):
    w = 1.0 + 0.1 * jnp.tanh(parts[:, 0])
    r = jnp.abs(jnp.tanh(jnp.sum(parts[:, 0]))) % 1.0
    idx = jax.lax.optimization_barrier(systematic_resample_indices(w, r))
    out = sorted_row_gather(parts, idx)
    return out + 1e-6 * jax.random.normal(k, out.shape, out.dtype)


@jax.jit
def step_uniform(parts, k):
    w = jnp.full((N,), 1.0 / N, jnp.float32)
    r = jnp.abs(jnp.tanh(jnp.sum(parts[:, 0]))) % 1.0
    idx = jax.lax.optimization_barrier(systematic_resample_indices(w, r))
    out = sorted_row_gather(parts, idx)
    return out + 1e-6 * jax.random.normal(k, out.shape, out.dtype)


@jax.jit
def step_skewed(parts, k):
    # heavily skewed weights: effective sample size ~ N/100
    w = jnp.exp(4.0 * jnp.tanh(parts[:, 0]) ** 2)
    r = jnp.abs(jnp.tanh(jnp.sum(parts[:, 0]))) % 1.0
    idx = jax.lax.optimization_barrier(systematic_resample_indices(w, r))
    out = sorted_row_gather(parts, idx)
    return out + 1e-6 * jax.random.normal(k, out.shape, out.dtype)


def bench(name, fn, parts):
    keys = jax.random.split(jax.random.PRNGKey(1), REPS + 1)
    p = fn(parts, keys[-1])
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for i in range(REPS):
        p = fn(p, keys[i])
    jax.block_until_ready(p)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:28s} {dt:8.3f} ms", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform} N=2^20", flush=True)
    parts = jax.random.normal(jax.random.PRNGKey(0), (N, 5), jnp.float32)
    for rnd in range(2):
        bench(f"[{rnd}] tanh weights", step_tanh, parts)
        bench(f"[{rnd}] uniform weights", step_uniform, parts)
        bench(f"[{rnd}] skewed weights", step_skewed, parts)


if __name__ == "__main__":
    main()
