"""Measure the relay per-dispatch latency floor and the TRUE device-side
per-step time of the fused PF step via lax.scan amortization.

f1: trivial tiny jit, chained           -> pure dispatch floor
f2: trivial (2^20,5) jit, chained       -> floor + transfer-ish
s(K): K fused PF steps inside ONE jit (lax.scan), chained state
      per-step device time ~= (T(K2) - T(K1)) / (K2 - K1), dispatch cancels.
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
from results._filter_bench import rig_dists  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402

N = 2 ** 20
REPS = 20


def timed_chain(name, fn, state, reps=REPS):
    s = state
    s = fn(s)  # warmup/compile
    jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        s = fn(s)
    jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:44s} {dt:9.3f} ms/call", flush=True)
    return dt


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)

    @jax.jit
    def f1(x):
        return x * 1.000001 + 1e-9

    timed_chain("f1 trivial tiny (8,128)", f1, jnp.ones((8, 128)))
    timed_chain("f2 trivial big (2^20,5)", f1, jnp.ones((N, 5)))

    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)

    def one_step(s, _):
        s = pf_core.step(s, u, z, jnp.float32(0.1), f, g, state_pdf, meas_pdf)
        return s, None

    def make_scan(k):
        @jax.jit
        def scank(s):
            s, _ = jax.lax.scan(one_step, s, None, length=k)
            return s
        return scank

    state = pf_core.init(jax.random.PRNGKey(0), N, x0)
    times = {}
    for k in (1, 8, 32):
        times[k] = timed_chain(f"scan K={k} fused PF steps", make_scan(k), state,
                               reps=8)
    per_step = (times[32] - times[8]) / (32 - 8)
    print(f"device per-step (K=32 vs K=8 slope): {per_step:.3f} ms "
          f"=> {1e3 / per_step:.0f} steps/s device-side", flush=True)
    per_step2 = (times[8] - times[1]) / 7
    print(f"device per-step (K=8 vs K=1 slope):  {per_step2:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
