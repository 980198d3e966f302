"""Honest (scan-slope) timing of the Pallas fused resample at several
(block_slots, window) configs, plus a sorted/unique-flagged scatter
variant of the XLA index path.

Known true costs at 2^20 (bench_slope.out): pred+upd 1.0 ms; scatter+scan
indices 8.4 ms; sorted gather 5.3 ms; full XLA step 14.9 ms.
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
from gpu_se_tpu.ops.resample_pallas import pallas_systematic_resample  # noqa: E402
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
    print(f"{name:52s} {per:8.3f} ms/step", flush=True)
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

    def make_pallas_step(b, w):
        def body(s):
            s = predupd(s)
            key, sub = jax.random.split(s.key)
            r = jax.random.uniform(sub, ())
            parts, _ = pallas_systematic_resample(
                s.particles, s.weights, r, block_slots=b, window=w
            )
            return pf_core.PFState(
                particles=parts,
                weights=jnp.full((N,), 1.0 / N, jnp.float32),
                key=key,
            )
        return body

    def sorted_unique_scatter(s):
        s = predupd(s)
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        n = N
        w = s.weights
        cum = jnp.cumsum(w)
        cum = cum / cum[-1]
        ends = jnp.clip(jnp.floor(n * cum - r).astype(jnp.int32), -1, n - 1)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1] + 1])
        valid = starts <= ends
        ks = jnp.arange(n, dtype=jnp.int32)
        # invalid entries -> DISTINCT out-of-range slots n+k: indices strictly
        # increasing and unique -> sorted+unique scatter flags, drop mode
        pos = jnp.where(valid, starts, n + ks)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,),
        )
        seed = jax.lax.scatter_max(
            jnp.zeros(n, jnp.int32), pos[:, None], ks, dn,
            indices_are_sorted=True, unique_indices=True,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
        )
        idx = jax.lax.associative_scan(jnp.maximum, seed)
        wout = jnp.full((N,), 1.0 / N, jnp.float32) + 0.0 * idx.astype(jnp.float32)
        return s.replace(weights=wout, key=key)

    slope("x sorted+unique scatter indices only", sorted_unique_scatter)
    for b, w in ((512, 512), (1024, 1024), (2048, 1024), (1024, 2048)):
        slope(f"p pallas fused B={b} W={w} (full step)", make_pallas_step(b, w))


if __name__ == "__main__":
    main()
