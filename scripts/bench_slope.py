"""Stage attribution of the fused PF step via lax.scan SLOPES.

Per-call timings through the relay are unreliable (per-dispatch latency is
~0.04 ms but the relay may serve repeated values from cache, producing
fictional sub-ms numbers). Slopes of K-step scans cancel both effects:
device_per_step = (T(K2) - T(K1)) / (K2 - K1), one dispatch per call,
state chained inside the scan.
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
K1, K2 = 2, 10
REPS = 6


def slope(name, body):
    def make(k):
        @jax.jit
        def scank(s):
            s, _ = jax.lax.scan(lambda s, _: (body(s), None), s, None, length=k)
            return s
        return scank

    times = {}
    for k in (K1, K2):
        fn = make(k)
        s = fn(STATE)
        jax.block_until_ready(s.particles)
        t0 = time.perf_counter()
        for _ in range(REPS):
            s = fn(s)
        jax.block_until_ready(s.particles)
        times[k] = (time.perf_counter() - t0) / REPS * 1e3
    per = (times[K2] - times[K1]) / (K2 - K1)
    print(f"{name:46s} {per:8.3f} ms/step  (T{K1}={times[K1]:.1f} T{K2}={times[K2]:.1f})",
          flush=True)
    return per


def main():
    global STATE
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    dt_ = jnp.float32(0.1)
    STATE = pf_core.init(jax.random.PRNGKey(0), N, x0)

    def pred(s):
        return pf_core.predict(s, u, dt_, f, state_pdf)

    def predupd(s):
        return pf_core.update(pred(s), u, z, g, meas_pdf)

    def consume(s, arr):
        w = jnp.full((N,), 1.0 / N, jnp.float32) + 0.0 * arr.astype(jnp.float32)
        return s.replace(weights=w)

    def s1(s):
        return pred(s)

    def s2(s):
        return predupd(s)

    def s3_cumsum(s):
        s = predupd(s)
        return consume(s, jnp.cumsum(s.weights))

    def s4_indices(s):
        s = predupd(s)
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        idx = systematic_resample_indices(s.weights, r)
        return consume(s.replace(key=key), idx)

    def s5_gather_fixed(s):
        # gather with a FIXED sorted index vector (data-independent):
        # isolates the gather op itself
        s = predupd(s)
        idx = jax.lax.optimization_barrier(
            jnp.clip(jnp.arange(N, dtype=jnp.int32) // 2 * 2, 0, N - 1)
        )
        parts = sorted_row_gather(s.particles, idx)
        return s.replace(particles=parts)

    def s6_full(s):
        s = predupd(s)
        return pf_core.resample(s)

    slope("s1 predict", s1)
    slope("s2 predict+update", s2)
    slope("s3 +cumsum", s3_cumsum)
    slope("s4 +indices (scatter+scan)", s4_indices)
    slope("s5 pred+upd + FIXED-idx gather", s5_gather_fixed)
    slope("s6 full step (prod)", s6_full)


if __name__ == "__main__":
    main()
