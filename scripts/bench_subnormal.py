"""Is the in-context resample slowness caused by the post-update weight
VALUES (subnormal-range floats), and does rescaling fix it?"""
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
REPS = 30


def bench(name, fn, state):
    for rnd in range(2):
        s = state
        t0 = time.perf_counter()
        for _ in range(REPS):
            s = fn(s)
        jax.block_until_ready(s.particles)
        dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:52s} {dt:8.3f} ms (round1)", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    dt_ = jnp.float32(0.1)

    def resample_tail(s):
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        idx = jax.lax.optimization_barrier(systematic_resample_indices(s.weights, r))
        parts = sorted_row_gather(s.particles, idx)
        return pf_core.PFState(
            particles=parts, weights=jnp.full((N,), 1.0 / N, jnp.float32), key=key
        )

    @jax.jit
    def q3_structure_same_benign_weights(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        s = pf_core.update(s, u, z, g, meas_pdf)
        # discard pdf values; benign O(1) weights with identical program shape
        s = s.replace(weights=1.0 + 0.1 * jnp.tanh(s.particles[:, 0]))
        return resample_tail(s)

    @jax.jit
    def q4_rescaled_pdf_weights(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        s = pf_core.update(s, u, z, g, meas_pdf)
        # rescale by the max so values leave the subnormal range
        s = s.replace(weights=s.weights / jnp.max(s.weights))
        return resample_tail(s)

    @jax.jit
    def q5_stabilized(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        s = pf_core.update_stabilized(s, u, z, g, meas_pdf)
        return resample_tail(s)

    @jax.jit
    def q6_raw_pdf_weights(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        s = pf_core.update(s, u, z, g, meas_pdf)
        return resample_tail(s)

    state = pf_core.init(jax.random.PRNGKey(0), N, x0)
    bench("q3 same structure, benign weights", q3_structure_same_benign_weights, state)
    bench("q4 pdf weights / max", q4_rescaled_pdf_weights, state)
    bench("q5 stabilized (log-space) update", q5_stabilized, state)
    bench("q6 raw pdf weights (current default)", q6_raw_pdf_weights, state)

    # inspect actual weight magnitudes after one update
    s = jax.jit(lambda s: pf_core.update(
        pf_core.predict(s, u, dt_, f, state_pdf), u, z, g, meas_pdf))(state)
    w = np.asarray(s.weights, np.float32)
    sub = np.sum((np.abs(w) < 1.2e-38) & (w != 0))
    print(f"weights: min={w.min():.3e} max={w.max():.3e} "
          f"zeros={np.sum(w == 0)} subnormals={sub}", flush=True)


if __name__ == "__main__":
    main()
