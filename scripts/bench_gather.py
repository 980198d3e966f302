"""Microbenchmark: systematic-resample gather strategies on the real TPU.

The PF full step at 2^20 spends ~12 ms in the ancestor row gather
(jnp.take); XLA TPU dynamic gathers serialize per row. Candidates:

  A  idx (scatter+cummax) + jnp.take                    [current default]
  B  idx + jnp.take(indices_are_sorted, promise_in_bounds)
  C  segmented forward-fill: scatter rows at slot starts, then
     associative_scan with a select combine — NO gather at all
  D  transposed gather: particles stored (nx, N), take along lanes
  E  index computation alone (for attribution)
  F  full current systematic_resample (index + barrier + take)

Run: env PYTHONPATH=/root/.axon_site python scripts/bench_gather.py [N_log2]
Chained varying inputs every rep (the relay caches identical calls).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gpu_se_tpu.filters.resampling import (  # noqa: E402
    systematic_resample,
    systematic_resample_indices,
)

N = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
NX = 5
REPS = 20


def _indices(weights, r):
    return jax.lax.optimization_barrier(systematic_resample_indices(weights, r))


def variant_a(parts, weights, r):
    idx = _indices(weights, r)
    return jnp.take(parts, idx, axis=0)


def variant_b(parts, weights, r):
    idx = _indices(weights, r)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    return jax.lax.gather(
        parts, idx[:, None], dn, slice_sizes=(1, parts.shape[1]),
        indices_are_sorted=True, unique_indices=False,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def variant_c(parts, weights, r):
    n = parts.shape[0]
    cs = jnp.cumsum(weights)
    cs = cs / cs[-1]
    ends = jnp.clip(jnp.floor(n * cs - r).astype(jnp.int32), -1, n - 1)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1] + 1])
    valid = starts <= ends
    pos = jnp.where(valid, starts, n)
    seedv = jnp.zeros_like(parts).at[pos].set(parts, mode="drop")
    flag = jnp.zeros((n, 1), bool).at[pos].set(True, mode="drop")

    def comb(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va), fa | fb

    v, _ = jax.lax.associative_scan(comb, (seedv, flag), axis=0)
    return v


def variant_d(parts_t, weights, r):
    idx = _indices(weights, r)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(1,), start_index_map=(1,)
    )
    out = jax.lax.gather(
        parts_t, idx[:, None], dn, slice_sizes=(parts_t.shape[0], 1),
        indices_are_sorted=True, mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    return out  # stays (nx, n) so the chained loop keeps its layout


def variant_e(parts, weights, r):
    idx = systematic_resample_indices(weights, r)
    # touch parts so the chained loop has the same signature
    return parts + 0 * idx[:, None].astype(parts.dtype)


def variant_f(parts, weights, r):
    out, _ = systematic_resample(parts, weights, jax.random.PRNGKey(0))
    return out


def make_loop(fn, transposed=False):
    @jax.jit
    def body(parts, k):
        # weights near-uniform but input-dependent so every rep differs
        ax = 1 if transposed else 0
        col = parts[0] if transposed else parts[:, 0]
        w = 1.0 + 0.1 * jnp.tanh(col)
        r = jnp.abs(jnp.tanh(jnp.sum(col))) % 1.0
        out = fn(parts, w, r)
        # small perturbation so the next rep's inputs differ
        return out + 1e-6 * jax.random.normal(k, out.shape, out.dtype)

    return body


def bench(name, fn, parts0, transposed=False):
    body = make_loop(fn, transposed)
    keys = jax.random.split(jax.random.PRNGKey(1), REPS + 1)
    parts = body(parts0, keys[-1])
    jax.block_until_ready(parts)
    t0 = time.perf_counter()
    for i in range(REPS):
        parts = body(parts, keys[i])
    jax.block_until_ready(parts)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:55s} {dt:8.3f} ms")
    return dt


def main():
    print(f"platform={jax.devices()[0].platform} N=2^{int(np.log2(N))}")
    key = jax.random.PRNGKey(0)
    parts = jax.random.normal(key, (N, NX), jnp.float32)

    # correctness: all variants must match A exactly (CPU only — eager /
    # repeated one-off jits through the relay are seconds each)
    if jax.devices()[0].platform == "cpu":
        w = 1.0 + 0.1 * jnp.tanh(parts[:, 0])
        r = jnp.float32(0.37)
        ref = np.asarray(jax.jit(variant_a)(parts, w, r))
        for name, fn in [("B sorted-take", variant_b), ("C forward-fill", variant_c)]:
            got = np.asarray(jax.jit(fn)(parts, w, r))
            assert np.array_equal(ref, got), f"{name} mismatch"
        got_d = np.asarray(jax.jit(variant_d)(parts.T, w, r)).T
        assert np.array_equal(ref, got_d), "D mismatch"
        print("correctness OK")

    only = os.environ.get("VARIANTS", "ABCDEF")
    if "A" in only:
        bench("A take (current)", variant_a, parts)
    if "B" in only:
        bench("B take sorted+promise_in_bounds", variant_b, parts)
    if "C" in only:
        bench("C scatter + forward-fill scan (no gather)", variant_c, parts)
    if "D" in only:
        bench("D transposed lane gather", variant_d, jnp.asarray(parts.T), True)
    if "E" in only:
        bench("E index computation only", variant_e, parts)
    if "F" in only:
        bench("F full systematic_resample (current)", variant_f, parts)


if __name__ == "__main__":
    main()
