"""Attribute the v4 tiled-resample kernel's device time at 2^20 by
trace-time ablation (resample_pallas4.VARIANT): k-chain slopes of the
RESAMPLE ONLY (weights regenerated from the particle state each link so
the chain is data-dependent).

Legs: full | refprep (prep+post only, kernel skipped) | noacc |
nomm | chunkmm | nosearch | nogather.

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_v10.py [legs...]
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

from gpu_se_tpu.ops import resample_pallas4 as rp4  # noqa: E402

N = 2 ** 20
CALLS = 12
K_LO, K_HI = 1, 9


def chain_fn(k, leg):
    def link(parts, i):
        w = jnp.exp(4.0 * jnp.tanh(parts[:, 0]) ** 2) + 1e-9
        if leg.startswith("dead"):
            # degenerate regime (the real PF-update weight structure):
            # half the pool dead -> compaction path every link
            idx = jnp.arange(w.shape[0])
            w = jnp.where(idx < w.shape[0] // 2, 1e-12, w)
        r = jnp.abs(jnp.sum(parts[:, 1])) % jnp.float32(0.97)
        if leg == "refprep":
            # prep + post only: ends, tiling transpose, bases, back-
            # transpose of the INPUT tiling (kernel replaced by a slice)
            from gpu_se_tpu.ops.resample_coarse import ends_from_weights
            ends = ends_from_weights(w, r)
            t_alloc = N // 128 + 72
            p8 = jnp.zeros((8, t_alloc * 128), jnp.float32)
            p8 = p8.at[:5, :N].set(parts.T)
            p8 = p8.at[6].set(jnp.concatenate([
                ends.astype(jnp.float32),
                jnp.full((t_alloc * 128 - N,), rp4.BIG, jnp.float32)]))
            tiled = (p8.reshape(8, t_alloc, 128).transpose(1, 0, 2)
                     .reshape(t_alloc, 1024))
            es = ends[::4096]
            qs = jnp.arange(N // 4096 + 1, dtype=jnp.int32)[:, None] * 4096
            p = jnp.sum((es[None, :] < qs).astype(jnp.int32), axis=1)
            base = jnp.clip((p - 1) * 32, 0, t_alloc - 72)
            back = (tiled[:N // 128].reshape(N // 128, 8, 128)
                    .transpose(1, 0, 2).reshape(8, N))
            return back[:5].T + jnp.float32(1e-12) * base[0], None
        blk = 4096
        if leg.startswith("b"):
            blk = int(leg[1:])
        out, anc = rp4.pallas_systematic_resample_tiled(parts, w, r, block=blk)
        return out, None

    @jax.jit
    def run(p0, eps):
        parts = p0 + eps * 1e-9
        for i in range(k):
            parts, _ = link(parts, i)
        return jnp.sum(parts, dtype=jnp.float32)

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
    legs = sys.argv[1:] or ["full", "refprep", "noacc", "nomm",
                            "chunkmm", "nosearch", "nogather"]
    print(f"platform={jax.devices()[0].platform} N=2^20 resample-only "
          f"k={K_LO}..{K_HI}", flush=True)
    rng = np.random.default_rng(int(time.time() * 1000) % 2 ** 31)
    p0 = jnp.asarray(rng.standard_normal((N, 5)), jnp.float32)
    jax.block_until_ready(p0)
    for leg in legs:
        rp4.VARIANT = ("full" if leg == "refprep" or leg.startswith("b")
                       else leg)
        t_lo = measure(chain_fn(K_LO, leg), p0, rng)
        t_hi = measure(chain_fn(K_HI, leg), p0, rng)
        slope = (t_hi - t_lo) / (K_HI - K_LO)
        print(f"{leg:9s} T({K_LO})={t_lo:8.3f}  T({K_HI})={t_hi:8.3f}  "
              f"slope={slope:7.3f} ms/op", flush=True)
    rp4.VARIANT = "full"


if __name__ == "__main__":
    main()
