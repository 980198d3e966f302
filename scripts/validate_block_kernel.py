"""Bottom-up device validation of the ends-domain block kernel
(ops/resample_pallas_block.py) — small shapes first so a bad geometry
can't wedge the relay with a 2^20-scale program (CLAUDE.md protocol).

Usage:
  env PYTHONPATH=/root/.axon_site:. python scripts/validate_block_kernel.py [stage]
Stages run in order by default: sync12 pipe12 pipe16 pipe20 high20 multi16
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
from gpu_se_tpu.ops.resample_pallas_block import (  # noqa: E402
    block_resample_state,
    pallas_block_resample_round,
    pallas_block_resample_round_pipelined,
    pallas_systematic_resample_ends,
)


def check(n, fn_name, make_out):
    rng = np.random.default_rng(int(time.time() * 1000) % 2**31)
    parts = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)
    w = jnp.exp(4.0 * jnp.tanh(np.asarray(parts)[:, 0]) ** 2)
    w = jnp.asarray(w, jnp.float32)
    r = jnp.float32(rng.uniform())

    idx = jax.jit(systematic_resample_indices)(w, r)
    ref = sorted_row_gather(parts, jax.lax.optimization_barrier(idx))
    jax.block_until_ready(ref)

    out, anc = make_out(parts, w, r)
    jax.block_until_ready(anc)
    mism = int(jnp.sum(anc != idx))
    rows = int(jnp.sum(jnp.all(out == ref, axis=1)))
    status = "OK" if (mism == 0 and rows == n) else "FAIL"
    print(f"{fn_name} n=2^{int(np.log2(n))}: anc mism {mism}, rows {rows}/{n}"
          f" -> {status}", flush=True)
    return status == "OK"


def main():
    stages = sys.argv[1:] or ["sync12", "pipe12", "pipe16", "pipe20",
                              "multi16"]
    print("platform:", jax.devices()[0].platform, flush=True)

    def ends_of(w, r, n):
        cs = jnp.cumsum(w)
        cs = cs / cs[-1]
        e = jnp.floor(n * cs - r).astype(jnp.int32)
        return jnp.clip(jax.lax.cummax(e), -1, n - 1)

    if "sync12" in stages:
        @jax.jit
        def sync12(p, w, r):
            n = p.shape[0]
            c, a, f = block_resample_state(n, 5)
            c, a, f = pallas_block_resample_round(
                ends_of(w, r, n), p, 0, c, a, f, 128, 256)
            return a[:, :5], jnp.clip(c[:, 0], 0, n - 1)
        assert check(2**12, "sync 128/256", sync12)

    def make_pipe(n, b, w_, prec=None):
        kw = {} if prec is None else dict(gather_precision=prec)

        @jax.jit
        def pipe(p, w, r):
            return pallas_systematic_resample_ends(p, w, r, b, w_, **kw)
        return pipe

    if "pipe12" in stages:
        assert check(2**12, "pipelined 128/256", make_pipe(2**12, 128, 256))
    if "pipe16" in stages:
        assert check(2**16, "pipelined 256/256", make_pipe(2**16, 256, 256))
    if "pipe20" in stages:
        assert check(2**20, "pipelined 256/256", make_pipe(2**20, 256, 256))
    # NOTE: Precision.HIGH is not lowerable by Mosaic (only DEFAULT /
    # HIGHEST) — the bf16x3 idea is moot; HIGHEST is the exact default.
    if "geom16" in stages:
        # validate every geometry the calibration sweep will time, at a
        # small size first (deadlock protocol, CLAUDE.md)
        for b, w_ in [(128, 256), (512, 256), (256, 512), (512, 512),
                      (1024, 256)]:
            assert check(2**16, f"pipelined {b}/{w_}", make_pipe(2**16, b, w_))
    if "multi16" in stages:
        # 4 ascending blocks with carried state == one-shot result
        n, nb = 2**16, 4
        nblk = n // nb

        @jax.jit
        def multi(p, w, r):
            e = ends_of(w, r, n)
            c, a, f = block_resample_state(n, 5)
            for q in range(nb):
                sl = slice(q * nblk, (q + 1) * nblk)
                c, a, f = pallas_block_resample_round_pipelined(
                    e[sl], p[sl], 0, c, a, f, 256, 256)
            return a[:, :5], jnp.clip(c[:, 0], 0, n - 1)
        assert check(2**16, "multi-block 4x pipelined", multi)

    print("ALL STAGES OK", flush=True)


if __name__ == "__main__":
    main()
