"""Bottom-up real-TPU validation of the v4 tiled resample kernel.

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/validate_v4.py [step]
  step 1: n=4096 compile + bit-check vs XLA (small, relay-safe)
  step 2: n=2^16 bit-check, all weight cases
  step 3: n=2^20 bit-check, all weight cases
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gpu_se_tpu.ops.resample_pallas4 import pallas_systematic_resample_tiled
from gpu_se_tpu.filters.resampling import systematic_resample_indices, sorted_row_gather

step = int(sys.argv[1]) if len(sys.argv) > 1 else 1
ns = {1: [4096, 5003], 2: [2**16, 70001], 3: [2**20]}[step]  # odd: pad-aware
print("platform:", jax.default_backend())

rng = np.random.default_rng(int(time.time()))

@jax.jit
def ref_fn(parts, w, r):
    idx = jax.lax.optimization_barrier(systematic_resample_indices(w, r))
    return sorted_row_gather(parts, idx), idx

v4 = jax.jit(lambda p, w, r: pallas_systematic_resample_tiled(p, w, r))

for n in ns:
    for case in ["uniform", "random", "peaky", "dead_runs", "onehot"]:
        if case == "uniform":
            w = np.ones(n, np.float32)
        elif case == "random":
            w = np.exp(rng.standard_normal(n)).astype(np.float32)
        elif case == "peaky":
            w = np.exp(5 * np.tanh(rng.standard_normal(n)) ** 2).astype(np.float32)
        elif case == "dead_runs":
            w = np.exp(rng.standard_normal(n)).astype(np.float32)
            w[: n // 2] = 1e-12
        else:
            w = np.full(n, 1e-12, np.float32); w[n // 3] = 1.0
        parts = rng.standard_normal((n, 5)).astype(np.float32)
        r = jnp.float32(rng.uniform())
        pj, wj = jnp.asarray(parts), jnp.asarray(w)
        t0 = time.time()
        out, anc = jax.block_until_ready(v4(pj, wj, r))
        t1 = time.time()
        ref, idx = jax.block_until_ready(ref_fn(pj, wj, r))
        ok_anc = np.array_equal(np.asarray(anc), np.asarray(idx))
        ok_out = np.array_equal(np.asarray(out), np.asarray(ref))
        print(f"n=2^{int(np.log2(n))} {case:9s} anc={'OK' if ok_anc else 'FAIL'} "
              f"out={'OK' if ok_out else 'FAIL'}  (v4 call {t1-t0:.2f}s)")
        if not (ok_anc and ok_out):
            bad = np.nonzero(np.asarray(anc) != np.asarray(idx))[0]
            print("   first bad:", bad[:5], np.asarray(anc)[bad[:5]],
                  np.asarray(idx)[bad[:5]])
            sys.exit(1)
print("step", step, "PASSED")
