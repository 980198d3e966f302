"""Calibrated timing: resample kernels v1 vs v3 (pipelined) vs XLA at 2^20.

Fresh inputs are derived ON DEVICE from a tiny host-fresh scalar (an
upload of fresh 20 MB host arrays per call costs ~4.4 s through the
relay and drowns the signal — see probe_v3_pipe.out). Each variant's
graph: perturb resident particles by eps, derive skewed weights
(exp(4 tanh^2), ESS ~ N/50), resample, scalar-reduce; null = the same
minus the resample. float() forces completion.
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

from gpu_se_tpu.filters.resampling import (  # noqa: E402
    sorted_row_gather,
    systematic_resample_indices,
)
from gpu_se_tpu.ops.resample_pallas import pallas_systematic_resample  # noqa: E402
from gpu_se_tpu.ops.resample_pallas3 import (  # noqa: E402
    pallas_systematic_resample_pipelined,
)
from gpu_se_tpu.ops.resample_pallas_block import (  # noqa: E402
    pallas_systematic_resample_ends,
)

N = 2 ** 20
CALLS = 25  # each net is ~1-10 ms under a ~25 ms sync RTT; 25 calls tames the jitter


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    seed = int(time.time() * 1000) % (2 ** 31)
    rng = np.random.default_rng(seed)
    parts = jnp.asarray(rng.standard_normal((N, 5)), jnp.float32)
    jax.block_until_ready(parts)

    def prep(p_, eps):
        p = p_ + eps * 1e-9
        w = jnp.exp(4.0 * jnp.tanh(p[:, 0]) ** 2)
        r = jnp.abs(eps) % 1.0
        return p, w, r

    def make(fn):
        @jax.jit
        def timed(p_, eps):
            p, w, r = prep(p_, eps)
            out, anc = fn(p, w, r)
            return jnp.sum(out, dtype=jnp.float32) + jnp.sum(anc.astype(jnp.float32))
        return timed

    @jax.jit
    def t_null(p_, eps):
        p, w, r = prep(p_, eps)
        return jnp.sum(p[0]) + jnp.sum(w, dtype=jnp.float32) * r

    @jax.jit
    def t_xla(p_, eps):
        p, w, r = prep(p_, eps)
        idx = jax.lax.optimization_barrier(systematic_resample_indices(w, r))
        out = sorted_row_gather(p, idx)
        return jnp.sum(out, dtype=jnp.float32) + jnp.sum(idx.astype(jnp.float32))

    all_variants = {
        "v1-128-256": ("v1 B=128 W=256", make(lambda p, w, r: pallas_systematic_resample(p, w, r, 128, 256))),
        "v3-128-256": ("v3 B=128 W=256", make(lambda p, w, r: pallas_systematic_resample_pipelined(p, w, r, 128, 256))),
        "v3-256-256": ("v3 B=256 W=256", make(lambda p, w, r: pallas_systematic_resample_pipelined(p, w, r, 256, 256))),
        "v3-256-512": ("v3 B=256 W=512", make(lambda p, w, r: pallas_systematic_resample_pipelined(p, w, r, 256, 512))),
        "v3-512-256": ("v3 B=512 W=256", make(lambda p, w, r: pallas_systematic_resample_pipelined(p, w, r, 512, 256))),
        "v3-512-512": ("v3 B=512 W=512", make(lambda p, w, r: pallas_systematic_resample_pipelined(p, w, r, 512, 512))),
        "v3-1024-512": ("v3 B=1024 W=512", make(lambda p, w, r: pallas_systematic_resample_pipelined(p, w, r, 1024, 512))),
        "v3-1024-1024": ("v3 B=1024 W=1024", make(lambda p, w, r: pallas_systematic_resample_pipelined(p, w, r, 1024, 1024))),
        "xla": ("xla scatter+gather", t_xla),
        "e-128-256": ("ends B=128 W=256", make(lambda p, w, r: pallas_systematic_resample_ends(p, w, r, 128, 256))),
        "e-256-256": ("ends B=256 W=256", make(lambda p, w, r: pallas_systematic_resample_ends(p, w, r, 256, 256))),
        "e-256-512": ("ends B=256 W=512", make(lambda p, w, r: pallas_systematic_resample_ends(p, w, r, 256, 512))),
        "e-512-512": ("ends B=512 W=512", make(lambda p, w, r: pallas_systematic_resample_ends(p, w, r, 512, 512))),
        "e-512-1024": ("ends B=512 W=1024", make(lambda p, w, r: pallas_systematic_resample_ends(p, w, r, 512, 1024))),
        "e-1024-1024": ("ends B=1024 W=1024", make(lambda p, w, r: pallas_systematic_resample_ends(p, w, r, 1024, 1024))),
        "eh-256-256": ("ends HIGH B=256 W=256", make(lambda p, w, r: pallas_systematic_resample_ends(p, w, r, 256, 256, gather_precision=jax.lax.Precision.HIGH))),
        "eh-512-512": ("ends HIGH B=512 W=512", make(lambda p, w, r: pallas_systematic_resample_ends(p, w, r, 512, 512, gather_precision=jax.lax.Precision.HIGH))),
        "es-256-256": ("ends sync B=256 W=256", make(lambda p, w, r: pallas_systematic_resample_ends(p, w, r, 256, 256, pipelined=False))),
    }
    # one geometry per invocation so an untested-geometry deadlock cannot
    # take the earlier measurements down with it (see CLAUDE.md)
    variants = [("null", t_null)] + [all_variants[k] for k in sys.argv[1:]]

    def measure(name, fn):
        float(fn(parts, jnp.float32(rng.standard_normal())))  # compile+warm
        times = []
        for _ in range(CALLS):
            eps = jnp.float32(rng.standard_normal())
            t0 = time.perf_counter()
            float(fn(parts, eps))
            times.append((time.perf_counter() - t0) * 1e3)
        qlo, med, qhi = np.percentile(times, [10, 50, 90])
        return float(med), float(qlo), float(qhi)

    null, nlo, nhi = measure(*variants[0])
    print(f"{'null':28s} median {null:8.2f} ms  [p10 {nlo:.2f}, p90 {nhi:.2f}]",
          flush=True)
    for name, fn in variants[1:]:
        med, qlo, qhi = measure(name, fn)
        print(f"{name:28s} median {med:8.2f} ms  [p10 {qlo:.2f}, p90 {qhi:.2f}]"
              f"  -> net {med - null:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
