"""Test the layout-mismatch hypothesis: the resample gather's OUTPUT has
layout {0,1}; feeding it back as the next step's input forces a 20 MB
relayout per call (outside the HLO — invisible to hlo_fix_probe).

w0: tail only, state chained (known slow, 17 ms)
w1: tail + elementwise epilogue on particles (should restore {1,0})
w2: print the actual .format of outputs
w3: full pred+upd+tail + epilogue  <- the production candidate
w4: with_layout_constraint forcing default layout on the gather output
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

from jax.experimental.layout import Format, Layout  # noqa: E402

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
    return s


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    dt_ = jnp.float32(0.1)

    def tail(s, epilogue=False):
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        idx = jax.lax.optimization_barrier(systematic_resample_indices(s.weights, r))
        parts = sorted_row_gather(s.particles, idx)
        if epilogue:
            parts = parts + (1e-38 * r)  # non-foldable elementwise epilogue
        return pf_core.PFState(
            particles=parts, weights=jnp.full((N,), 1.0 / N, jnp.float32), key=key
        )

    @jax.jit
    def w0_tail(s):
        return tail(s)

    @jax.jit
    def w1_tail_epilogue(s):
        return tail(s, epilogue=True)

    @jax.jit
    def w3_full_epilogue(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        s = pf_core.update(s, u, z, g, meas_pdf)
        return tail(s, epilogue=True)

    state = pf_core.init(jax.random.PRNGKey(0), N, x0)
    print("input format:", state.particles.format, flush=True)
    s_out = bench("w0 tail only (chained)", w0_tail, state)
    print("w0 out format:", s_out.particles.format, flush=True)
    s_out = bench("w1 tail + epilogue (chained)", w1_tail_epilogue, state)
    print("w1 out format:", s_out.particles.format, flush=True)
    s_out = bench("w3 full step + epilogue (chained)", w3_full_epilogue, state)
    print("w3 out format:", s_out.particles.format, flush=True)


if __name__ == "__main__":
    main()
