"""Probe v9: re-rank ALL resample kernels inside the full PF step with
the k-chain slope method.

The round-2 ranking (v1 best at B=128/W=256; v3 'slower'; ends-kernel
'slower') was built on isolated-call calibrated medians, which round 3
showed wobble +-1.5 ms between entries. This re-measures every kernel
family and the promising geometries as full-step slopes - the number
that actually sets bench.py.

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_v9.py [legs...]
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
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402

N = 2**20
CALLS = 12
K_LO, K_HI = 1, 9


def rig():
    from results._filter_bench import rig_dists

    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np),
                    jnp.float32)
    return x0, state_pdf, meas_pdf, f, g, u, z


def make_step(res_fn, rigt):
    x0, state_pdf, meas_pdf, f, g, u, z = rigt

    def step(st):
        st = pf_core.predict(st, u, jnp.float32(0.1), f, state_pdf)
        st = pf_core.update(st, u, z, g, meas_pdf)
        key, sub = jax.random.split(st.key)
        r = jax.random.uniform(sub, ())
        parts = res_fn(st.particles, st.weights, r)
        return pf_core.PFState(
            particles=parts,
            weights=jnp.full((N,), 1.0 / N, jnp.float32),
            key=key,
        )

    return step


def legs():
    from gpu_se_tpu.ops.resample_pallas import pallas_systematic_resample
    from gpu_se_tpu.ops.resample_pallas3 import (
        pallas_systematic_resample_pipelined,
    )
    from gpu_se_tpu.ops.resample_pallas_block import (
        pallas_systematic_resample_ends,
    )

    def v1(b, w):
        return lambda p, wt, r: pallas_systematic_resample(p, wt, r, b, w)[0]

    def v3(b, w):
        return lambda p, wt, r: pallas_systematic_resample_pipelined(
            p, wt, r, b, w)[0]

    def ends(b, w):
        return lambda p, wt, r: pallas_systematic_resample_ends(
            p, wt, r, b, w)[0]

    return {
        "v1_128_256": v1(128, 256),
        "v1_256_256": v1(256, 256),
        "v1_256_128": v1(256, 128),
        "v3_128_256": v3(128, 256),
        "v3_256_512": v3(256, 512),
        "v3_128_512": v3(128, 512),
        "v3_128_128": v3(128, 128),
        "ends_256_256": ends(256, 256),
    }


def chain_fn(step, k):
    @jax.jit
    def run(p0, eps):
        st = pf_core.PFState(
            particles=p0 + eps * 1e-9,
            weights=jnp.full((N,), 1.0 / N, jnp.float32),
            key=jax.random.PRNGKey(jnp.abs(eps * 1e6).astype(jnp.int32)),
        )
        for _ in range(k):
            st = step(st)
        return jnp.sum(st.particles, dtype=jnp.float32)

    return run


def main():
    sel = sys.argv[1:]
    print(f"platform={jax.devices()[0].platform} N=2^20", flush=True)
    rigt = rig()
    rng = np.random.default_rng(int(time.time() * 1000) % 2**31)
    p0 = jnp.asarray(
        rigt[0].draw(jax.random.PRNGKey(rng.integers(2**31)), (N,)),
        jnp.float32)
    jax.block_until_ready(p0)

    def measure(fn, calls=CALLS):
        float(fn(p0, jnp.float32(rng.standard_normal())))
        ts = []
        for _ in range(calls):
            eps = jnp.float32(rng.standard_normal())
            t0 = time.perf_counter()
            float(fn(p0, eps))
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(ts))

    for name, fn in legs().items():
        if sel and name not in sel:
            continue
        step = make_step(fn, rigt)
        t_lo = measure(chain_fn(step, K_LO))
        t_hi = measure(chain_fn(step, K_HI))
        print(f"{name:14s} T({K_LO})={t_lo:8.2f} T({K_HI})={t_hi:8.2f} "
              f"slope={(t_hi - t_lo) / 8:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
