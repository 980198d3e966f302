"""GSUKF noise-draw PRNG probe (VERDICT r4 next #7): threefry vs rbg
under the round-4 lanes-last 2-component draw_t at the GSUKF shape
(2^18 x 11 draws of nx=5).

rbg (XLA's hardware RBG) is not shard-partitionable the way
jax_threefry_partitionable streams are, so adoption would be a
single-device fast path only — this probe records whether the device
time justifies that complexity.

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_rbg.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from scripts.probe_tiled import rig  # noqa: E402

N = 2 ** 18
S = 11                       # sigma points (2*nx+1)
CALLS = 12
K_LO, K_HI = 1, 9


def chain(kind, k, state_pdf, size):
    @jax.jit
    def run(seed):
        acc = seed
        for i in range(k):
            if kind == "rbg":
                key = jax.random.key(
                    acc.astype(jnp.int32) + i, impl="rbg")
            else:
                key = jax.random.PRNGKey(acc.astype(jnp.int32) + i)
            noise = state_pdf.draw_t(key, size)        # (5, size)
            # consume the FULL array: a sliced consumer lets XLA narrow
            # the draw to the sampled lanes and the slope reads ~0
            # (the probe_gsf2 DCE gotcha, CLAUDE.md)
            acc = acc + jnp.sum(noise, dtype=jnp.float32) * 1e-6
        return acc

    return run


def measure(fn, rng, calls=CALLS):
    float(fn(jnp.float32(rng.standard_normal())))
    ts = []
    for _ in range(calls):
        seed = jnp.float32(abs(rng.standard_normal()) * 1e4)
        t0 = time.perf_counter()
        float(fn(seed))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    print(f"platform={jax.devices()[0].platform} draw_t 2^18x11 "
          f"k={K_LO}..{K_HI}", flush=True)
    rng = np.random.default_rng(int(time.time() * 1000) % 2 ** 31)
    _, state_pdf, _, _, _ = rig()
    for label, size in (("gsukf 2^18x11", N * S), ("pf 2^20", 2 ** 20)):
        for kind in ("threefry", "rbg"):
            t_lo = measure(chain(kind, K_LO, state_pdf, size), rng)
            t_hi = measure(chain(kind, K_HI, state_pdf, size), rng)
            print(f"{label} {kind:9s} T({K_LO})={t_lo:8.3f}  "
                  f"T({K_HI})={t_hi:8.3f}  "
                  f"slope={(t_hi - t_lo) / (K_HI - K_LO):7.3f} ms/draw",
                  flush=True)


if __name__ == "__main__":
    main()
