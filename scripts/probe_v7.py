"""Probe v7: k-chain slope of the FULL PF step for each resample impl.

The per-op calibrated medians have +-2 ms run-to-run wobble (probe_v6
outputs), too coarse to rank ~5 ms kernels. This measures what actually
matters - the fused predict+update+resample step at 2^20 - by timing an
in-jit chain of k dependent steps and taking the slope
(T(9) - T(1)) / 8, which cancels the sync RTT and any per-call fixed
relay cost. Chains are data-dependent (each step consumes the previous
state), so XLA cannot parallelize them; unlike the lax.scan bodies that
measured 200x fast (CLAUDE.md), the chain is unrolled and ends in a
scalar fetched with float().

Legs: nores (predict+update only) | xla | v1 kernel (current default) |
v6 coarse-window (with XLA transposes in/out of the (8,n) layout -
inside the fused step XLA can fuse them into neighboring elementwise
producers, so this also tests whether a transposed-layout refactor is
even needed).

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_v7.py
"""
import functools
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

import probe_v6  # noqa: E402  (same directory)
from gpu_se_tpu.filters import particle as pf_core  # noqa: E402
from gpu_se_tpu.filters import resampling  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402
from gpu_se_tpu.ops.resample_coarse import (  # noqa: E402
    chunk_boundaries, ends_from_weights,
)

N = 2**20
CALLS = 15
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


def make_step(kind, rigt):
    x0, state_pdf, meas_pdf, f, g, u, z = rigt

    def step(st):
        st = pf_core.predict(st, u, jnp.float32(0.1), f, state_pdf)
        st = pf_core.update(st, u, z, g, meas_pdf)
        if kind == "nores":
            return st
        key, sub = jax.random.split(st.key)
        r = jax.random.uniform(sub, ())
        if kind == "v6":
            e = ends_from_weights(st.weights, r)
            o = chunk_boundaries(e, N, 128)
            p8t = probe_v6.to_p8t(st.particles, e)
            out_t, anc = probe_v6.v6_resample_cps(p8t, e, o, N, 128, 4, 16)
            parts = out_t[:5].T
        elif kind == "xla":
            idx = jax.lax.optimization_barrier(
                resampling.systematic_resample_indices(st.weights, r))
            parts = resampling.sorted_row_gather(st.particles, idx)
        elif kind == "v1":
            from gpu_se_tpu.ops.resample_pallas import (
                pallas_systematic_resample,
            )

            parts, _ = pallas_systematic_resample(
                st.particles, st.weights, r, 128, 256)
        elif kind == "v3":
            from gpu_se_tpu.ops.resample_pallas3 import (
                pallas_systematic_resample_pipelined,
            )

            parts, _ = pallas_systematic_resample_pipelined(
                st.particles, st.weights, r, 128, 256)
        elif kind == "v4":
            from gpu_se_tpu.ops.resample_pallas4 import (
                pallas_systematic_resample_tiled,
            )

            parts, _ = pallas_systematic_resample_tiled(
                st.particles, st.weights, r)
        return pf_core.PFState(
            particles=parts,
            weights=jnp.full((N,), 1.0 / N, jnp.float32),
            key=key,
        )

    return step


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


def measure(fn, p0, rng, calls=CALLS):
    float(fn(p0, jnp.float32(rng.standard_normal())))
    ts = []
    for _ in range(calls):
        eps = jnp.float32(rng.standard_normal())
        t0 = time.perf_counter()
        float(fn(p0, eps))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    print(f"platform={jax.devices()[0].platform} N=2^20 "
          f"k={K_LO}..{K_HI}", flush=True)
    rigt = rig()
    rng = np.random.default_rng(int(time.time() * 1000) % 2**31)
    p0 = jnp.asarray(
        rigt[0].draw(jax.random.PRNGKey(rng.integers(2**31)), (N,)),
        jnp.float32)
    jax.block_until_ready(p0)

    import sys
    kinds = sys.argv[1:] or ("nores", "xla", "v1", "v3", "v4")
    for kind in kinds:
        step = make_step(kind, rigt)
        t_lo = measure(chain_fn(step, K_LO), p0, rng)
        t_hi = measure(chain_fn(step, K_HI), p0, rng)
        slope = (t_hi - t_lo) / (K_HI - K_LO)
        print(f"{kind:6s} T({K_LO})={t_lo:8.3f}  T({K_HI})={t_hi:8.3f}  "
              f"slope={slope:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
