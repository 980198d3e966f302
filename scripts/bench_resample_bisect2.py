"""Round 2: distinguish 'uniform weights slow' from 'bit-identical chained
inputs slow' (relay artifact), and attribute fused-step time."""
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
from gpu_se_tpu.filters.particle import PFState  # noqa: E402
from results._filter_bench import rig_dists  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402

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
    print(f"{name:44s} {dt:8.3f} ms", flush=True)


@jax.jit
def h1_resample_perturbed(state):
    # uniform weights every call, but particles perturbed so no two calls
    # see bit-identical inputs
    key, k1 = jax.random.split(state.key)
    s = pf_core.resample(state.replace(key=key))
    return s.replace(
        particles=s.particles
        + 1e-6 * jax.random.normal(k1, s.particles.shape, s.particles.dtype)
    )


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)

    @jax.jit
    def h2_full_step(state):
        return pf_core.step(state, u, z, jnp.float32(0.1), f, g, state_pdf, meas_pdf)

    @jax.jit
    def h3_predict_update(state):
        s = pf_core.predict(state, u, jnp.float32(0.1), f, state_pdf)
        return pf_core.update(s, u, z, g, meas_pdf)

    state = pf_core.init(jax.random.PRNGKey(0), N, x0)
    bench("h1 resample, perturbed inputs", h1_resample_perturbed, state)
    bench("h3 predict+update only", h3_predict_update, state)
    bench("h2 full fused step", h2_full_step, state)
    bench("h2 full fused step (repeat)", h2_full_step, state)


if __name__ == "__main__":
    main()
