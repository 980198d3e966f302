"""Slope-measured alternatives for the resample index computation and
gather (honest scan-slope methodology; see bench_slope.py).

Known (bench_slope.out): pred+upd 1.0 ms; +scatter/scan indices 9.5 ms;
+fixed-idx sorted gather 6.2 ms; full 14.9 ms.
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
from gpu_se_tpu.filters.resampling import sorted_row_gather  # noqa: E402
from results._filter_bench import rig_dists  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402

N = 2 ** 20
K1, K2 = 2, 10
REPS = 6
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


def idx_sortsearch(weights, r):
    n = weights.shape[0]
    cum = jnp.cumsum(weights)
    cum = cum / cum[-1]
    u = (jnp.arange(n, dtype=weights.dtype) + r) / n
    return jnp.clip(
        jnp.searchsorted(cum, u, side="left", method="sort"), 0, n - 1
    ).astype(jnp.int32)


def idx_rank_of_slots_in_ends(weights, r):
    """idx[i] = #{k: ends_k < i} via one stable sort of the merged arrays."""
    n = weights.shape[0]
    cum = jnp.cumsum(weights)
    cum = cum / cum[-1]
    ends = jnp.clip(jnp.floor(n * cum - r), -1, n - 1).astype(jnp.int32)
    # merge ends (sorted) and slots 0..n-1: key = 2*v (+1 for slots so that
    # equal values order ends first -> '<' count); single sort of 2n int32
    keys = jnp.concatenate([ends * 2 + 1, jnp.arange(n, dtype=jnp.int32) * 2])
    tags = jnp.concatenate([jnp.ones(n, jnp.int32), jnp.zeros(n, jnp.int32)])
    order = jnp.argsort(keys, stable=True)
    tags_sorted = jnp.take(tags, order)
    ranks = jnp.cumsum(tags_sorted)  # ends seen so far at each merged pos
    # positions of the slot entries in the merged order
    slot_pos = jnp.argsort(jnp.where(tags_sorted == 0, 1, 0), stable=True)
    # simpler: gather ranks at positions where tag==0, in slot order
    inv = jnp.zeros(2 * n, jnp.int32).at[order].set(jnp.arange(2 * n, jnp.int32))
    slot_ranks = jnp.take(ranks, inv[n:])
    return jnp.clip(slot_ranks, 0, n - 1)


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

    def consume(s, arr):
        w = jnp.full((N,), 1.0 / N, jnp.float32) + 0.0 * arr.astype(jnp.float32)
        return s.replace(weights=w)

    def a_sortsearch_only(s):
        s = predupd(s)
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        idx = idx_sortsearch(s.weights, r)
        return consume(s.replace(key=key), idx)

    def b_full_sortsearch(s):
        s = predupd(s)
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        idx = jax.lax.optimization_barrier(idx_sortsearch(s.weights, r))
        parts = sorted_row_gather(s.particles, idx)
        return pf_core.PFState(
            particles=parts, weights=jnp.full((N,), 1.0 / N, jnp.float32), key=key
        )

    def c_full_sortsearch_take(s):
        s = predupd(s)
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        idx = jax.lax.optimization_barrier(idx_sortsearch(s.weights, r))
        parts = jnp.take(s.particles, idx, axis=0)
        return pf_core.PFState(
            particles=parts, weights=jnp.full((N,), 1.0 / N, jnp.float32), key=key
        )

    def d_transposed_gather(s):
        s = predupd(s)
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        idx = jax.lax.optimization_barrier(idx_sortsearch(s.weights, r))
        parts_t = s.particles.T  # (5, N)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(1,), start_index_map=(1,)
        )
        out_t = jax.lax.gather(
            parts_t, idx[:, None], dn, slice_sizes=(parts_t.shape[0], 1),
            indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )  # (5, N) -> transpose back
        return pf_core.PFState(
            particles=out_t.T, weights=jnp.full((N,), 1.0 / N, jnp.float32),
            key=key,
        )

    slope("a pred+upd + sort-searchsorted idx only", a_sortsearch_only)
    slope("b FULL: sort-idx + sorted row gather", b_full_sortsearch)
    slope("c FULL: sort-idx + plain take", c_full_sortsearch_take)
    slope("d FULL: sort-idx + transposed lane gather", d_transposed_gather)


if __name__ == "__main__":
    main()
