"""Slope-benchmark the v2 fused resample inside the full PF step at 2^20.

Baselines (slope-measured, v5e): XLA full step 14.9 ms (pred+upd 1.0,
indices 8.4, gather 5.3); v1 pallas full step 12.9 ms.
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
from gpu_se_tpu.ops.resample_pallas2 import fused_systematic_resample_v2  # noqa: E402
from results._filter_bench import rig_dists  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402

N = 2 ** 20
K1, K2 = 2, 10
REPS = 5
STATE = None


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
    print(f"{name:52s} {per:8.3f} ms/step  => {1e3 / per:6.1f} steps/s",
          flush=True)
    return per


def main():
    global STATE
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u_in = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u_in), xp=np), jnp.float32)
    dt_ = jnp.float32(0.1)
    STATE = pf_core.init(jax.random.PRNGKey(0), N, x0)

    def predupd(s):
        s = pf_core.predict(s, u_in, dt_, f, state_pdf)
        return pf_core.update(s, u_in, z, g, meas_pdf)

    def make_step(window, block):
        def body(s):
            s = predupd(s)
            key, sub = jax.random.split(s.key)
            r = jax.random.uniform(sub, ())
            parts = fused_systematic_resample_v2(
                s.particles, s.weights, r, window=window, block=block
            )
            return pf_core.PFState(
                particles=parts,
                weights=jnp.full((N,), 1.0 / N, jnp.float32),
                key=key,
            )
        return body

    for wdw, blk in ((1024, 1024), (2048, 2048), (512, 512), (2048, 1024),
                     (4096, 2048)):
        slope(f"v2 full step W={wdw} B={blk}", make_step(wdw, blk))


if __name__ == "__main__":
    main()
