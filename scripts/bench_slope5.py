"""Slope-measure GATHER primitive alternatives at 2^20 with a FIXED
(data-independent but unfoldable) sorted index vector.

Theory to test: the 5.3 ms row gather is tile-granular (one (8,128) tile
per row = 4 GB moved); 1-D takes or other layouts may run at bandwidth.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 2 ** 20
K1, K2 = 2, 10
REPS = 5


def slope(name, body, x0):
    def make(k):
        @jax.jit
        def scank(x):
            x, _ = jax.lax.scan(lambda x, _: (body(x), None), x, None, length=k)
            return x
        return scank

    times = {}
    for k in (K1, K2):
        fn = make(k)
        s = fn(x0)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(REPS):
            s = fn(s)
        jax.block_until_ready(s)
        times[k] = (time.perf_counter() - t0) / REPS * 1e3
    per = (times[K2] - times[K1]) / (K2 - K1)
    print(f"{name:52s} {per:8.3f} ms/step  T{K1}={times[K1]:.3f} T{K2}={times[K2]:.3f}", flush=True)


IDX0 = None  # irregular sorted base indices, set in main()


def fixed_idx(x_scalar):
    """Irregular sorted indices XLA cannot canonicalize (a too-regular
    affine pattern gets rewritten into slice/broadcast and measures 0)."""
    off = (x_scalar * 3).astype(jnp.int32) % 2
    return jnp.clip(IDX0 + off, 0, N - 1)


def main():
    global IDX0
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    key = jax.random.PRNGKey(0)
    # irregular sorted ancestor-like indices from a real weight profile
    wprof = 1.0 + jax.random.uniform(key, (N,))
    cs = jnp.cumsum(wprof); cs = cs / cs[-1]
    IDX0 = jnp.clip(jnp.floor(N * cs - 0.4), 0, N - 1).astype(jnp.int32)
    IDX0 = jax.lax.cummax(IDX0)
    a2d = jax.random.normal(key, (N, 5), jnp.float32)
    a1d = jax.random.normal(key, (N,), jnp.float32)
    a2dT = jnp.asarray(a2d.T)  # (5, N)
    a128 = jax.random.normal(key, (N, 128), jnp.float32)

    def g_take_rows(x):
        idx = fixed_idx(jnp.sum(x[0]))
        return jnp.take(x, idx, axis=0) * 1.000001

    def g_take_1d(x):
        idx = fixed_idx(jnp.sum(x[:8]))
        return jnp.take(x, idx) * 1.000001

    def g_take_T(x):
        idx = fixed_idx(jnp.sum(x[:, 0]))
        return jnp.take(x, idx, axis=1) * 1.000001

    def g_take_5x1d(x):
        idx = fixed_idx(jnp.sum(x[0]))
        cols = [jnp.take(x[:, j], idx) for j in range(5)]
        return jnp.stack(cols, axis=1) * 1.000001

    def g_take_128(x):
        idx = fixed_idx(jnp.sum(x[0]))
        return jnp.take(x, idx, axis=0) * 1.000001

    slope("take rows (N,5)", g_take_rows, a2d)
    slope("take 1-D (N,)", g_take_1d, a1d)
    slope("take 5 x 1-D columns", g_take_5x1d, a2d)
    slope("take transposed (5,N) axis=1", g_take_T, a2dT)
    slope("take rows (N,128) [tile-granularity probe]", g_take_128, a128)


if __name__ == "__main__":
    main()
