"""Real-TPU bit-exactness ladder for the round-5 bank resample kernel
(rows=24 symmetric-packed GSUKF payload): 2^12 / 2^14 / 2^18 across
weight families, kernel vs the XLA scatter+cummax + sorted-gather path.

Small shapes first per the validation protocol (a deadlocked kernel
wedges the shared relay).

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/validate_bank.py
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

from gpu_se_tpu.filters.resampling import (  # noqa: E402
    sorted_row_gather,
    systematic_resample_indices,
)
from gpu_se_tpu.ops import resample_pallas4 as rp4  # noqa: E402


def family(rng, n, kind):
    if kind == "uniform":
        w = np.full(n, 1.0 / n, np.float32)
    elif kind == "exp":
        w = np.exp(rng.standard_normal(n)).astype(np.float32)
    elif kind == "heavy":
        w = np.exp(4.0 * rng.standard_normal(n)).astype(np.float32)
    elif kind == "dead_half":
        w = np.exp(rng.standard_normal(n)).astype(np.float32)
        w[: n // 2] = 1e-12
    else:  # hyper-degenerate: ~n/1024 live
        w = np.full(n, 1e-12, np.float32)
        live = rng.choice(n, max(4, n // 1024), replace=False)
        w[live] = np.exp(rng.standard_normal(live.size)).astype(np.float32)
    return jnp.asarray(w)


@jax.jit
def xla_path(means, covs, w, r):
    idx = systematic_resample_indices(w, r)
    idx = jax.lax.optimization_barrier(idx)
    return sorted_row_gather(means, idx), sorted_row_gather(covs, idx), idx


def main():
    rng = np.random.default_rng(int(time.time() * 1000) % 2**31)
    print(f"platform={jax.devices()[0].platform}", flush=True)
    kernel = jax.jit(rp4.pallas_systematic_resample_bank)
    for n in (2**12, 2**14, 300000, 2**18):  # 300000: pad-aware odd size
        for kind in ("uniform", "exp", "heavy", "dead_half", "hyper"):
            means = jnp.asarray(
                rng.standard_normal((n, 5)), jnp.float32)
            a = rng.standard_normal((n, 5, 5)).astype(np.float32)
            covs = np.einsum("nij,nkj->nik", a, a)
            covs = 0.5 * (covs + covs.transpose(0, 2, 1))
            covs = jnp.asarray(covs, jnp.float32)
            w = family(rng, n, kind)
            r = jnp.float32(rng.uniform())
            m2, c2, anc = kernel(means, covs, w, r)
            m1, c1, idx = xla_path(means, covs, w, r)
            ok = (
                bool(jnp.array_equal(anc, idx))
                and bool(jnp.array_equal(m2, m1))
                and bool(jnp.array_equal(c2, c1))
            )
            print(f"n=2^{int(np.log2(n))} {kind:10s} "
                  f"bitwise={'OK' if ok else 'FAIL'}", flush=True)
            if not ok:
                d = np.flatnonzero(np.asarray(anc) != np.asarray(idx))
                print(f"  first anc mismatches: {d[:5]}", flush=True)
                sys.exit(1)
    print("all OK", flush=True)


if __name__ == "__main__":
    main()
