"""Does materializing resample inputs (barrier on particles/weights)
recover the fast path inside the fused PF step?"""
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
from gpu_se_tpu.filters.resampling import systematic_resample  # noqa: E402
from results._filter_bench import rig_dists  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402

N = 2 ** 20
REPS = 30


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)

    @jax.jit
    def step_barrier(state):
        s = pf_core.predict(state, u, jnp.float32(0.1), f, state_pdf)
        s = pf_core.update(s, u, z, g, meas_pdf)
        # materialize resample inputs before the resample ops
        p, w = jax.lax.optimization_barrier((s.particles, s.weights))
        key, sub = jax.random.split(s.key)
        parts, w2 = systematic_resample(p, w, sub)
        return pf_core.PFState(particles=parts, weights=w2, key=key)

    state = pf_core.init(jax.random.PRNGKey(0), N, x0)
    for rnd in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            state = step_barrier(state)
        jax.block_until_ready(state.particles)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"round {rnd}: {dt:8.3f} ms/step  ({1e3 / dt:.1f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
