"""Decompose v2 resample cost: XLA pre, compact kernel, chunk_lo glue,
expand kernel — each measured by scan slopes at 2^20."""
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

import gpu_se_tpu.ops.resample_pallas2 as v2  # noqa: E402

N = 2 ** 20
K1, K2 = 2, 10
REPS = 5
W = B = int(os.environ.get("WB", 512))
W_EXP = ((B + 1 + 127 + 127) // 128 + 1) * 128
N_PAD = N + W_EXP + 2 * W + 256


def slope(name, body, x0):
    def step(carry, _):
        x, key = carry
        key, sub = jax.random.split(key)
        x = body(x) + 1e-6 * jax.random.uniform(sub, x.shape, x.dtype)
        return (x, key), None

    def make(k):
        @jax.jit
        def scank(x, key):
            (x, key), _ = jax.lax.scan(step, (x, key), None, length=k)
            return x, key
        return scank

    times = {}
    for k in (K1, K2):
        fn = make(k)
        s, key = fn(x0, jax.random.PRNGKey(k))
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(REPS):
            s, key = fn(s, key)
        jax.block_until_ready(s)
        times[k] = (time.perf_counter() - t0) / REPS * 1e3
    per = (times[K2] - times[K1]) / (K2 - K1)
    print(f"{name:48s} {per:8.3f} ms/step  T{K1}={times[K1]:.2f} T{K2}={times[K2]:.2f}", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform} N={N} W=B={W} "
          f"W_EXP={W_EXP}", flush=True)
    key = jax.random.PRNGKey(0)
    w0 = 1.0 + jax.random.uniform(key, (N,), jnp.float32)

    def pre(w):
        n = N
        cum = jnp.cumsum(w)
        cum = cum / cum[-1]
        ends = jax.lax.cummax(jnp.floor(n * cum - 0.4))
        ends = jnp.clip(ends, -1.0, n - 1.0)
        c_incl = ends + 1.0
        prev = jnp.concatenate([jnp.zeros(1, c_incl.dtype), c_incl[:-1]])
        flags = (c_incl > prev).astype(jnp.float32)
        return c_incl, flags

    def p1_pre_only(w):
        c_incl, flags = pre(w)
        return w * 1.000001 + 1e-9 * (c_incl[-1] + flags[-1])

    def p2_pre_compact(w):
        c_incl, flags = pre(w)
        vals8 = jnp.concatenate(
            [jnp.stack([w, w * 1.1, w * 0.9, w + 1, w - 1]), c_incl[None],
             flags[None], jnp.zeros((1, N), jnp.float32)], axis=0)
        stream = v2._compact(vals8, N_PAD, W)
        return w * 1.000001 + 1e-9 * stream[5, 0]

    def p3_pre_compact_glue(w):
        c_incl, flags = pre(w)
        n_surv = jnp.sum(flags).astype(jnp.int32)
        vals8 = jnp.concatenate(
            [jnp.stack([w, w * 1.1, w * 0.9, w + 1, w - 1]), c_incl[None],
             flags[None], jnp.zeros((1, N), jnp.float32)], axis=0)
        stream = v2._compact(vals8, N_PAD, W)
        col = jnp.arange(N_PAD, dtype=jnp.int32)[None, :]
        row = jnp.arange(8, dtype=jnp.int32)[:, None]
        pad_template = jnp.where(row == 5, jnp.float32(v2._BIG), 0.0)
        stream = jnp.where(col < n_surv, stream, pad_template)
        c_vec = stream[5]
        bounds = jnp.arange(N // B, dtype=jnp.float32) * B
        chunk_lo = jnp.sum(
            (c_vec[None, :] <= bounds[:, None]).astype(jnp.int32), axis=1)
        lo = jnp.minimum((chunk_lo // 128) * 128, N_PAD - W_EXP)
        return w * 1.000001 + 1e-9 * (stream[5, 0] + lo[-1].astype(jnp.float32))

    def p4_full(w):
        parts = jnp.stack([w, w * 1.1, w * 0.9, w + 1, w - 1], axis=1)
        out = v2.fused_systematic_resample_v2(
            parts, w, jnp.float32(0.4), window=W, block=B)
        return jnp.abs(out[:, 0]) * 1.000001 + 1e-6

    slope("p1 XLA pre (cumsum/cummax/ends/flags)", p1_pre_only, w0)
    slope("p2 + compact kernel", p2_pre_compact, w0)
    slope("p3 + mask/chunk_lo glue", p3_pre_compact_glue, w0)
    slope("p4 full v2 resample", p4_full, w0)


if __name__ == "__main__":
    main()
