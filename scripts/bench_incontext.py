"""In-context bisection of the index computation + Pallas alternative.
All numbers are round-1 (round 0 discarded: relay first-loop artifact)."""
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
from gpu_se_tpu.ops.resample_pallas import pallas_systematic_resample  # noqa: E402
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
    print(f"{name:46s} {dt:8.3f} ms (round1)", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    dt_ = jnp.float32(0.1)

    def pred_upd(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        return pf_core.update(s, u, z, g, meas_pdf)

    def consume(s, arr):
        w = jnp.full((N,), 1.0 / N, jnp.float32) + 0.0 * arr.astype(jnp.float32)
        return s.replace(weights=w)

    @jax.jit
    def t1_cumsum(s):
        s = pred_upd(s)
        cs = jnp.cumsum(s.weights)
        return consume(s, cs)

    @jax.jit
    def t2_ends(s):
        s = pred_upd(s)
        cs = jnp.cumsum(s.weights)
        cs = cs / cs[-1]
        ends = jnp.clip(jnp.floor(N * cs - 0.3).astype(jnp.int32), -1, N - 1)
        return consume(s, ends)

    @jax.jit
    def t3_scatter(s):
        s = pred_upd(s)
        cs = jnp.cumsum(s.weights)
        cs = cs / cs[-1]
        ends = jnp.clip(jnp.floor(N * cs - 0.3).astype(jnp.int32), -1, N - 1)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1] + 1])
        valid = starts <= ends
        ks = jnp.arange(N, dtype=jnp.int32)
        seed = (
            jnp.zeros(N, jnp.int32)
            .at[jnp.where(valid, starts, N)]
            .max(jnp.where(valid, ks, 0), mode="drop")
        )
        return consume(s, seed)

    @jax.jit
    def t4_scan(s):
        s = pred_upd(s)
        cs = jnp.cumsum(s.weights)
        cs = cs / cs[-1]
        ends = jnp.clip(jnp.floor(N * cs - 0.3).astype(jnp.int32), -1, N - 1)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1] + 1])
        valid = starts <= ends
        ks = jnp.arange(N, dtype=jnp.int32)
        seed = (
            jnp.zeros(N, jnp.int32)
            .at[jnp.where(valid, starts, N)]
            .max(jnp.where(valid, ks, 0), mode="drop")
        )
        idx = jax.lax.associative_scan(jnp.maximum, seed)
        return consume(s, idx)

    @jax.jit
    def r2_pallas_incontext(s):
        s = pred_upd(s)
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        parts, _ = pallas_systematic_resample(s.particles, s.weights, r)
        return pf_core.PFState(
            particles=parts, weights=jnp.full((N,), 1.0 / N, jnp.float32), key=key
        )

    @jax.jit
    def r1_pallas_standalone(s):
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        w = 1.0 + 0.1 * jnp.tanh(s.particles[:, 0])
        parts, _ = pallas_systematic_resample(s.particles, w, r)
        return pf_core.PFState(
            particles=parts, weights=jnp.full((N,), 1.0 / N, jnp.float32), key=key
        )

    state = pf_core.init(jax.random.PRNGKey(0), N, x0)
    bench("t1 +cumsum", t1_cumsum, state)
    bench("t2 +ends", t2_ends, state)
    bench("t3 +scatter", t3_scatter, state)
    bench("t4 +assoc scan", t4_scan, state)
    bench("r1 pallas standalone", r1_pallas_standalone, state)
    bench("r2 pallas in context", r2_pallas_incontext, state)


if __name__ == "__main__":
    main()
