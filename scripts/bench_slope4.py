"""Cost of the XLA glue for the two-kernel resample redesign:
  g1: ends/C/flags elementwise pre-pass (given cumsum)
  g2: chunk_lo = #{C <= c*B} compare-reduce, 2048 boundaries
  g3: same via blocked matmul formulation
Slope methodology (see bench_slope.py).
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

N = 2 ** 20
B = 512
K1, K2 = 2, 16
REPS = 6


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
    print(f"{name:52s} {per:8.3f} ms/step", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    key = jax.random.PRNGKey(0)
    w0 = 1.0 + 0.1 * jax.random.normal(key, (N,), jnp.float32) ** 2

    def g1_pre(w):
        cum = jnp.cumsum(w)
        cum = cum / cum[-1]
        r = w[0] % 1.0
        ends = jnp.clip(jnp.floor(N * cum - r), -1, N - 1)
        c_incl = ends + 1.0
        prev = jnp.concatenate([jnp.zeros(1, c_incl.dtype), c_incl[:-1]])
        flags = (c_incl > prev).astype(jnp.float32)
        return w + 1e-12 * (c_incl * flags)

    def g2_chunklo(w):
        c_vals = jnp.cumsum(w)  # stand-in sorted stream
        bounds = (jnp.arange(N // B, dtype=jnp.float32) * B)
        lo = jnp.sum(
            (c_vals[:, None] <= bounds[None, :]).astype(jnp.float32), axis=0
        )
        return w + 1e-12 * jnp.sum(lo)

    def g3_chunklo_blocked(w):
        c_vals = jnp.cumsum(w).reshape(-1, 512)
        bounds = (jnp.arange(N // B, dtype=jnp.float32) * B)
        lo = jnp.einsum(
            "kb,kbc->c",
            jnp.ones_like(c_vals),
            (c_vals[:, :, None] <= bounds[None, None, :]).astype(jnp.float32),
        )
        return w + 1e-12 * jnp.sum(lo)

    slope("g1 ends/C/flags pre-pass", g1_pre, w0)
    slope("g2 chunk_lo compare-reduce (N x 2048)", g2_chunklo, w0)


if __name__ == "__main__":
    main()
