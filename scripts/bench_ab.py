"""Controlled A/B: isolate WHAT makes a chained resample loop slow.

Factors (one at a time, same harness everywhere):
  r provenance: loop-computed scalar vs compile-time constant
  output arity: 1 array vs 3 arrays (tuple) vs PFState dataclass
  weights: uniform (identity gather) vs non-uniform (spread gather)
  gather present vs absent
"""
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

from gpu_se_tpu.filters.particle import PFState  # noqa: E402
from gpu_se_tpu.filters import particle as pf_core  # noqa: E402
from gpu_se_tpu.filters.resampling import (  # noqa: E402
    sorted_row_gather,
    systematic_resample_indices,
)
from results._filter_bench import rig_dists  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402

N = 2 ** 20
REPS = 20


def bench(name, fn, *args):
    for rnd in range(2):
        state = args
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*state)
            state = out if isinstance(out, tuple) else (out,)
        jax.block_until_ready(state[0] if isinstance(state, tuple) else state)
        dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:56s} {dt:8.3f} ms", flush=True)


def resample(parts, w, r):
    idx = jax.lax.optimization_barrier(systematic_resample_indices(w, r))
    return sorted_row_gather(parts, idx)


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    key0 = jax.random.PRNGKey(0)
    parts0 = jax.random.normal(key0, (N, 5), jnp.float32)
    w_nonuni0 = 1.0 + 0.1 * jnp.tanh(parts0[:, 0])
    w_uni0 = jnp.full((N,), 1.0 / N, jnp.float32)

    # --- 1 array out, nonuniform recomputed in loop ---------------------
    @jax.jit
    def a1_const_r(parts):
        w = 1.0 + 0.1 * jnp.tanh(parts[:, 0])
        out = resample(parts, w, jnp.float32(0.37))
        return out + 1e-6  # perturb so inputs differ each rep

    @jax.jit
    def a2_loop_r(parts):
        w = 1.0 + 0.1 * jnp.tanh(parts[:, 0])
        r = jnp.abs(jnp.tanh(jnp.sum(parts[:, 1]))) % 1.0
        out = resample(parts, w, r)
        return out + 1e-6

    # --- 3 arrays out (tuple) -------------------------------------------
    @jax.jit
    def b1_tuple3(parts, w, key):
        key, sub = jax.random.split(key)
        r = jax.random.uniform(sub, ())
        w2 = 1.0 + 0.1 * jnp.tanh(parts[:, 0])
        out = resample(parts, w2, r)
        return out + 1e-6, w, key

    # --- PFState out ------------------------------------------------------
    @jax.jit
    def c1_state_nonuni(s):
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        w2 = 1.0 + 0.1 * jnp.tanh(s.particles[:, 0])
        out = resample(s.particles, w2, r)
        return PFState(particles=out + 1e-6, weights=s.weights, key=key)

    @jax.jit
    def c2_state_uniform_weights_out(s):
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        w2 = 1.0 + 0.1 * jnp.tanh(s.particles[:, 0])
        out = resample(s.particles, w2, r)
        return PFState(
            particles=out + 1e-6,
            weights=jnp.full((N,), 1.0 / N, jnp.float32),
            key=key,
        )

    # --- uniform-weights gather (identity indices) ------------------------
    @jax.jit
    def a3_uniform_w(parts):
        w = jnp.full((N,), 1.0 / N, jnp.float32)
        r = jnp.abs(jnp.tanh(jnp.sum(parts[:, 1]))) % 1.0
        out = resample(parts, w, r)
        return out + 1e-6

    # --- state-weights tail (w0 clone: weights from the INPUT state) ----
    @jax.jit
    def c3_state_weights_tail(s):
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        out = resample(s.particles, s.weights, r)
        return PFState(
            particles=out,
            weights=jnp.full((N,), 1.0 / N, jnp.float32),
            key=key,
        )

    @jax.jit
    def c4_state_weights_tail_perturbed(s):
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        out = resample(s.particles, s.weights, r)
        return PFState(
            particles=out + 1e-6,
            weights=jnp.full((N,), 1.0 / N, jnp.float32),
            key=key,
        )

    x_ss, x0d, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    import numpy as np
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)

    @jax.jit
    def d1_full_step(s):
        return pf_core.step(s, u, z, jnp.float32(0.1), f, g, state_pdf, meas_pdf)

    state0 = PFState(particles=parts0, weights=w_uni0, key=key0)
    bench("a1 one-array out, const r, nonuni w", a1_const_r, parts0)
    bench("a2 one-array out, loop r, nonuni w", a2_loop_r, parts0)
    bench("a3 one-array out, loop r, UNIFORM w", a3_uniform_w, parts0)
    bench("b1 tuple3 out, key r, nonuni w", b1_tuple3, parts0, w_nonuni0, key0)
    bench("c1 PFState out, key r, nonuni w, w pass-through", c1_state_nonuni, state0)
    bench("c2 PFState out, key r, nonuni w, w fresh-full", c2_state_uniform_weights_out, state0)
    bench("c3 PFState out, weights FROM STATE", c3_state_weights_tail, state0)
    bench("c4 c3 + particle perturb", c4_state_weights_tail_perturbed, state0)
    rig_state = pf_core.init(jax.random.PRNGKey(0), N, x0d)
    bench("d1 FULL pf step (production)", d1_full_step, rig_state)


if __name__ == "__main__":
    main()
