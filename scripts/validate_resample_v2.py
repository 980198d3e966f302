"""Validate resample_pallas2 against the XLA scatter+cummax reference.

CPU interpret mode first (several sizes/weight shapes incl. degenerate),
then — with --tpu — small-to-large on the real chip (bottom-up per the
relay-wedge protocol).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
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
    sorted_row_gather,
    systematic_resample_indices,
)
import gpu_se_tpu.ops.resample_pallas2 as v2  # noqa: E402

INTERPRET = "--tpu" not in sys.argv


def reference(parts, w, r):
    idx = systematic_resample_indices(w, r)
    return jnp.take(parts, idx, axis=0)


def check(n, window, block, wkind, seed, nx=5):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    parts = jax.random.normal(k1, (n, nx), jnp.float32)
    if wkind == "uniform":
        w = jnp.full((n,), 1.0 / n, jnp.float32)
    elif wkind == "mild":
        w = 1.0 + 0.1 * jnp.tanh(parts[:, 0])
    elif wkind == "degenerate":
        w = jnp.exp(-50.0 * parts[:, 0] ** 2) + 1e-12
    elif wkind == "spike":
        w = jnp.full((n,), 1e-12, jnp.float32).at[n // 3].set(1.0)
    r = jnp.float32(0.37 + 0.01 * seed)

    got = jax.jit(
        lambda p, w, r: v2.fused_systematic_resample_v2(
            p, w, r, window=window, block=block, interpret=INTERPRET)
    )(parts, w, r)
    exp = jax.jit(reference)(parts, w, r)
    ok = np.array_equal(np.asarray(got), np.asarray(exp))
    print(f"n={n:7d} W={window:5d} B={block:5d} {wkind:10s} seed={seed}: "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        g, e = np.asarray(got), np.asarray(exp)
        bad = np.where(np.any(g != e, axis=1))[0]
        print("  first bad rows:", bad[:10], "of", len(bad))
        print("  got ", g[bad[0]], "\n  exp ", e[bad[0]])
        sys.exit(1)


def main():
    if INTERPRET:
        sizes = [(1024, 256, 256), (2048, 256, 512), (4096, 512, 256)]
    else:
        sizes = [(2 ** 14, 512, 512), (2 ** 17, 1024, 1024),
                 (2 ** 20, 1024, 1024)]
    for n, wdw, blk in sizes:
        for wkind in ("uniform", "mild", "degenerate", "spike"):
            check(n, wdw, blk, wkind, seed=3)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
