"""Probe v8: attribute the v6 kernel's ~1.2 us/chunk overhead.

probe_v7: v6 full-step slope 11.8 ms vs v1 9.3, nores 0.65. The v6
kernel's VPU work is ~100 ns/chunk; the rest is pipeline machinery.
This times k-chains of resample-only steps for kernel variants:

  full     : the real v6 kernel (cps=16, nwin=4, b=128)
  nogather : cnt compute + write, gather/select removed
  nocnt    : gather with cnt := slot-lane iota (compare removed)
  onewin   : nwin=1 (quarter the fetch specs; results wrong, timing only)
  bigout   : out written for only the first sub-chunk (write volume /16)

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_v8.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gpu_se_tpu.ops.resample_coarse import (  # noqa: E402
    chunk_boundaries, ends_from_weights,
)

N = 2**20
B = 128
NWIN = 4
CPS = 16
CALLS = 12
K_LO, K_HI = 1, 9
ROWS = 8
ENDS_ROW = 6
CNT_ROW = 6


def _kernel(jblk_ref, *refs, b, nwin, cps, variant):
    out_ref = refs[cps * nwin]
    i = pl.program_id(0)
    for k in range(cps):
        blocks = [r[...] for r in refs[k * nwin:(k + 1) * nwin]]
        if variant == "nocnt":
            cnt_l = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1).astype(
                jnp.float32)
        else:
            slot = (
                jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
                + (i * cps + k) * b
            ).astype(jnp.float32)
            cnt_sub = jnp.zeros((b, 1), jnp.float32)
            for t in range(nwin):
                ew = blocks[t][ENDS_ROW:ENDS_ROW + 1, :]
                lt = (ew < slot).astype(jnp.float32)
                cnt_sub = cnt_sub + jnp.sum(lt, axis=1, keepdims=True)
            cnt_l = jnp.transpose(cnt_sub, (1, 0))
        if variant == "nogather":
            out_ref[:, k * b:(k + 1) * b] = jnp.broadcast_to(cnt_l, (ROWS, b))
            continue
        rows = jnp.zeros((ROWS, b), jnp.float32)
        for t in range(nwin):
            within = jnp.clip(cnt_l - t * b, 0.0, b - 1.0).astype(jnp.int32)
            idx = jnp.broadcast_to(within, (ROWS, b))
            g = jnp.take_along_axis(blocks[t], idx, axis=1)
            sel = (cnt_l >= t * b) & (cnt_l < (t + 1) * b)
            rows = jnp.where(jnp.broadcast_to(sel, (ROWS, b)), g, rows)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, b), 0)
        res = jnp.where(rowi == CNT_ROW, jnp.broadcast_to(cnt_l, (ROWS, b)),
                        rows)
        if variant == "bigout":
            if k == 0:
                out_ref[...] = jnp.broadcast_to(res, (ROWS, cps * b))
        else:
            out_ref[:, k * b:(k + 1) * b] = res


def kernel_call(p8t, o, n, b, nwin, cps, variant):
    npad = n + 8 * b
    nblk_tot = npad // b
    bigf = jnp.float32(2.0 ** 25)
    pad = jnp.zeros((ROWS, 8 * b), jnp.float32).at[ENDS_ROW].set(bigf)
    p_pad = jnp.concatenate([p8t, pad], axis=1)
    jblk = jnp.clip(o[:-1] // b, 0, nblk_tot - nwin).astype(jnp.int32)
    kernel = functools.partial(
        _kernel, b=b, nwin=nwin, cps=cps, variant=variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // b // cps,),
        in_specs=[
            pl.BlockSpec(
                (ROWS, b),
                (lambda i, jb, k=k, t=t: (0, jb[i * cps + k] + t)))
            for k in range(cps) for t in range(nwin)
        ],
        out_specs=pl.BlockSpec((ROWS, cps * b), lambda i, jb: (0, i)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, n), jnp.float32),
    )(jblk, *([p_pad] * (cps * nwin)))


def make_chain(variant, nwin, k):
    @jax.jit
    def run(pt0, eps):
        pt = pt0 + eps * 1e-9
        acc = jnp.float32(0.0)
        for _ in range(k):
            w = jnp.exp(4.0 * jnp.tanh(pt[0]) ** 2)
            r = jnp.abs(eps) % 1.0
            e = ends_from_weights(w, r)
            o = chunk_boundaries(e, N, B)
            p8t = pt.at[ENDS_ROW].set(e.astype(jnp.float32))
            out_t = kernel_call(p8t, o, N, B, nwin, CPS, variant)
            pt = out_t  # dependent chain
            acc = acc + jnp.sum(out_t[0], dtype=jnp.float32)
        return acc

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
    print(f"platform={jax.devices()[0].platform} N=2^20 b={B} nwin={NWIN} "
          f"cps={CPS}", flush=True)
    rng = np.random.default_rng(int(time.time() * 1000) % 2**31)
    pt0 = jnp.zeros((ROWS, N), jnp.float32).at[:5].set(
        jnp.asarray(rng.standard_normal((5, N)), jnp.float32))
    jax.block_until_ready(pt0)

    for variant, nwin in [("full", NWIN), ("nogather", NWIN),
                          ("nocnt", NWIN), ("onewin", 1), ("bigout", NWIN)]:
        v = "full" if variant == "onewin" else variant
        t_lo = measure(make_chain(v, nwin, K_LO), pt0, rng)
        t_hi = measure(make_chain(v, nwin, K_HI), pt0, rng)
        slope = (t_hi - t_lo) / (K_HI - K_LO)
        print(f"{variant:9s} T({K_LO})={t_lo:8.3f}  T({K_HI})={t_hi:8.3f}  "
              f"slope={slope:7.3f} ms/op", flush=True)


if __name__ == "__main__":
    main()
