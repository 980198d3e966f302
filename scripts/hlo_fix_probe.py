"""Probe which graph shapes keep the native (fast) sorted gather instead
of XLA's kCustom transposed-gather fusion + 20MB layout copy."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gpu_se_tpu.filters.particle import PFState
from gpu_se_tpu.filters.resampling import (
    sorted_row_gather,
    systematic_resample_indices,
)

N = 2 ** 20


def report(name, compiled):
    text = compiled.as_text()
    native = re.findall(r"%gather[^\n]*indices_are_sorted=true", text)
    kcustom = re.findall(r"kind=kCustom[^\n]*gather", text)
    copies = re.findall(r"copy-start", text)
    print(f"{name}: native_gather={len(native)} kcustom_gather={len(kcustom)} "
          f"copy_start={len(copies)}", flush=True)


def core(parts, weights, key):
    r = jax.random.uniform(key, ())
    idx = jax.lax.optimization_barrier(systematic_resample_indices(weights, r))
    return sorted_row_gather(parts, idx)


def v0_state(state):
    key, sub = jax.random.split(state.key)
    parts = core(state.particles, state.weights, sub)
    w = jnp.full((N,), 1.0 / N, state.weights.dtype)
    return PFState(particles=parts, weights=w, key=key)


def v1_barrier_after(state):
    key, sub = jax.random.split(state.key)
    parts = jax.lax.optimization_barrier(core(state.particles, state.weights, sub))
    w = jnp.full((N,), 1.0 / N, state.weights.dtype)
    return PFState(particles=parts, weights=w, key=key)


def v2_tuple_out(state):
    key, sub = jax.random.split(state.key)
    parts = core(state.particles, state.weights, sub)
    return parts, key


def v3_arrays_in(parts, weights, key):
    key, sub = jax.random.split(key)
    out = core(parts, weights, sub)
    w = jnp.full((N,), 1.0 / N, weights.dtype)
    return out, w, key


def v4_fastfn(parts, weights, r):
    idx = jax.lax.optimization_barrier(systematic_resample_indices(weights, r))
    return sorted_row_gather(parts, idx)


def v5_r_from_key(parts, weights, key):
    r = jax.random.uniform(key, ())
    idx = jax.lax.optimization_barrier(systematic_resample_indices(weights, r))
    return sorted_row_gather(parts, idx)


def v6_single_out_full_weights(parts, weights, key):
    r = jax.random.uniform(key, ())
    idx = jax.lax.optimization_barrier(systematic_resample_indices(weights, r))
    return sorted_row_gather(parts, idx), jnp.full((N,), 1.0 / N, weights.dtype)


def main():
    parts = jnp.zeros((N, 5), jnp.float32)
    w = jnp.ones((N,), jnp.float32)
    r = jnp.float32(0.3)
    state = PFState(particles=parts, weights=w, key=jax.random.PRNGKey(0))
    report("v4 fastfn r param        ", jax.jit(v4_fastfn).lower(parts, w, r).compile())
    report("v5 r from key            ", jax.jit(v5_r_from_key).lower(parts, w, jax.random.PRNGKey(0)).compile())
    report("v6 r from key + weights  ", jax.jit(v6_single_out_full_weights).lower(parts, w, jax.random.PRNGKey(0)).compile())
    report("v0 PFState in/out        ", jax.jit(v0_state).lower(state).compile())
    report("v1 barrier after gather  ", jax.jit(v1_barrier_after).lower(state).compile())
    report("v2 tuple out             ", jax.jit(v2_tuple_out).lower(state).compile())
    report("v3 plain arrays          ", jax.jit(v3_arrays_in).lower(parts, w, jax.random.PRNGKey(0)).compile())


if __name__ == "__main__":
    main()
