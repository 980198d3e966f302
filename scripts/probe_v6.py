"""Probe v6: aligned-block coarse-window resample, windows fetched by
Mosaic's own pipeline (scalar-prefetch block index maps) and the local
gather done with tpu.dynamic_gather (take_along_axis) - no one-hot
matmul, no XLA slice-gather.

probe_v5.out: the XLA coarse slice-gather alone costs ~8 ms at 2^20
(XLA lowers it as a serial per-slice loop), sinking the v5 variant.
Mosaic block fetches ARE plain DMAs; dynamic_gather replaces the
(b,w)x(w,8) HIGHEST dot whose 128-lane N padding x 6 passes costs
~4 ms however tuned.

Layout learnings baked in (first TPU attempt died in Mosaic):
  * no lane-dim concatenates across tiles -> the window stays as nwin
    separate (8, b) blocks, per-block gather + select.
  * dim-1 dynamic_gather indices must stay inside one 128-lane tile ->
    b = 128 and per-block `within` offsets clipped to [0, b).
  * ends ride the payload as an f32 row (exact for values < 2^25, i.e.
    any n <= 2^24 - the reference's own max), so every kernel value is
    lane-oriented f32 and the only relayout is one (b,1)->(1,b)
    transpose of the counts.
  * ancestors come back as f32 row 6 of the output block (cheap XLA
    postprocess adds jblk*b), avoiding a second 1-D output.

Chunk i of b output slots reads nwin aligned source blocks starting at
block jblk[i] = o_i // b (scalar-prefetched), o_i = #{ends < i*b}.
Exact iff every span o_{i+1} - o_i <= (nwin-1)*b - b... strictly:
o_i - jblk*b < b and window covers o_{i+1}, so guard is
o_{i+1} - o_i <= (nwin-2)*b + 1 conservatively; production checks
overflow = any(anc escapes the window) and falls back via lax.cond.

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_v6.py [small|big|time]
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

from gpu_se_tpu.filters.resampling import (  # noqa: E402
    sorted_row_gather, systematic_resample_indices,
)
from gpu_se_tpu.ops.resample_coarse import (  # noqa: E402
    chunk_boundaries, ends_from_weights,
)

CALLS = 25
ROWS = 8       # payload rows per block (sublane tile)
ENDS_ROW = 6   # row of p8t carrying ends as f32
CNT_ROW = 6    # row of the output carrying the in-window offsets


def _kernel(jblk_ref, *refs, b, nwin):
    blocks = [r[...] for r in refs[:nwin]]  # nwin x (ROWS, b) f32
    out_ref = refs[nwin]
    i = pl.program_id(0)
    slot = (
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0) + i * b
    ).astype(jnp.float32)
    cnt_sub = jnp.zeros((b, 1), jnp.float32)
    for t in range(nwin):
        ew = blocks[t][ENDS_ROW:ENDS_ROW + 1, :]  # (1, b) f32
        lt = (ew < slot).astype(jnp.float32)  # (b, b)
        cnt_sub = cnt_sub + jnp.sum(lt, axis=1, keepdims=True)
    cnt_l = jnp.transpose(cnt_sub, (1, 0))  # (1, b) lane-oriented
    rows = jnp.zeros((ROWS, b), jnp.float32)
    for t in range(nwin):
        within = jnp.clip(cnt_l - t * b, 0.0, b - 1.0).astype(jnp.int32)
        idx = jnp.broadcast_to(within, (ROWS, b))
        g = jnp.take_along_axis(blocks[t], idx, axis=1)  # (ROWS, b)
        sel = (cnt_l >= t * b) & (cnt_l < (t + 1) * b)  # (1, b)
        rows = jnp.where(jnp.broadcast_to(sel, (ROWS, b)), g, rows)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, b), 0)
    out_ref[...] = jnp.where(
        rowi == CNT_ROW, jnp.broadcast_to(cnt_l, (ROWS, b)), rows)


def _kernel_cps(jblk_ref, *refs, b, nwin, cps):
    out_ref = refs[cps * nwin]
    i = pl.program_id(0)
    for k in range(cps):
        blocks = [r[...] for r in refs[k * nwin:(k + 1) * nwin]]
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
        rows = jnp.zeros((ROWS, b), jnp.float32)
        for t in range(nwin):
            within = jnp.clip(cnt_l - t * b, 0.0, b - 1.0).astype(jnp.int32)
            idx = jnp.broadcast_to(within, (ROWS, b))
            g = jnp.take_along_axis(blocks[t], idx, axis=1)
            sel = (cnt_l >= t * b) & (cnt_l < (t + 1) * b)
            rows = jnp.where(jnp.broadcast_to(sel, (ROWS, b)), g, rows)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, b), 0)
        out_ref[:, k * b:(k + 1) * b] = jnp.where(
            rowi == CNT_ROW, jnp.broadcast_to(cnt_l, (ROWS, b)), rows)


def v6_resample_cps(p8t, ends, o, n, b, nwin, cps, interpret=False):
    """cps sub-chunks per grid step (cuts the per-step overhead that
    dominates the cps=1 variant: 8192 steps x ~1.2 us = 10 ms)."""
    nch = n // b
    npad = n + nwin * b
    nblk_tot = npad // b
    bigf = jnp.float32(2.0 ** 25)
    pad = jnp.zeros((ROWS, nwin * b), jnp.float32)
    pad = pad.at[ENDS_ROW].set(bigf)
    p_pad = jnp.concatenate([p8t, pad], axis=1)
    jblk = jnp.clip(o[:-1] // b, 0, nblk_tot - nwin).astype(jnp.int32)

    kernel = functools.partial(_kernel_cps, b=b, nwin=nwin, cps=cps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nch // cps,),
        in_specs=[
            pl.BlockSpec(
                (ROWS, b),
                (lambda i, jb, k=k, t=t: (0, jb[i * cps + k] + t)))
            for k in range(cps) for t in range(nwin)
        ],
        out_specs=pl.BlockSpec((ROWS, cps * b), lambda i, jb: (0, i)),
    )
    out_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, n), jnp.float32),
        interpret=interpret,
    )(jblk, *([p_pad] * (cps * nwin)))
    cnt = out_t[CNT_ROW].astype(jnp.int32).reshape(nch, b)
    anc = (jblk[:, None] * b + cnt).reshape(n)
    return out_t, anc


def v6_resample(p8t, ends, o, n, b, nwin, interpret=False):
    """p8t (ROWS, n) f32 with payload rows + ends-f32 in ENDS_ROW,
    ends (n,) i32 monotone, o (n/b + 1,) boundaries.
    Returns (out_t (ROWS, n) f32, anc (n,) i32)."""
    nch = n // b
    npad = n + nwin * b
    nblk_tot = npad // b
    bigf = jnp.float32(2.0 ** 25)
    pad = jnp.zeros((ROWS, nwin * b), jnp.float32)
    pad = pad.at[ENDS_ROW].set(bigf)
    p_pad = jnp.concatenate([p8t, pad], axis=1)  # (ROWS, npad)
    jblk = jnp.clip(o[:-1] // b, 0, nblk_tot - nwin).astype(jnp.int32)

    kernel = functools.partial(_kernel, b=b, nwin=nwin)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nch,),
        in_specs=[
            pl.BlockSpec((ROWS, b), (lambda i, jb, t=t: (0, jb[i] + t)))
            for t in range(nwin)
        ],
        out_specs=pl.BlockSpec((ROWS, b), lambda i, jb: (0, i)),
    )
    out_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, n), jnp.float32),
        interpret=interpret,
    )(jblk, *([p_pad] * nwin))
    cnt = out_t[CNT_ROW].astype(jnp.int32).reshape(nch, b)
    anc = (jblk[:, None] * b + cnt).reshape(n)
    return out_t, anc


def prep(p_, eps):
    p = p_ + eps * 1e-9
    w = jnp.exp(4.0 * jnp.tanh(p[:, 0]) ** 2)
    r = jnp.abs(eps) % 1.0
    return p, w, r


def to_p8t(p, ends):
    n, nx = p.shape
    p8t = jnp.zeros((ROWS, n), jnp.float32)
    p8t = p8t.at[:nx].set(p.astype(jnp.float32).T)
    return p8t.at[ENDS_ROW].set(ends.astype(jnp.float32))


def full(p, w, r, n, b, nwin, cps=1, interpret=False):
    e = ends_from_weights(w, r)
    o = chunk_boundaries(e, n, b)
    if cps > 1:
        out_t, anc = v6_resample_cps(
            to_p8t(p, e), e, o, n, b, nwin, cps, interpret)
    else:
        out_t, anc = v6_resample(to_p8t(p, e), e, o, n, b, nwin, interpret)
    return out_t[: p.shape[1]].T, anc


def run_check(n, b, nwin, cps=1, interpret=False):
    rng = np.random.default_rng(int(time.time() * 1000) % 2**31)
    parts = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)

    @jax.jit
    def check(p_, eps):
        p, w, r = prep(p_, eps)
        idx = jax.lax.optimization_barrier(systematic_resample_indices(w, r))
        ref = sorted_row_gather(p, idx)
        e = ends_from_weights(w, r)
        o = chunk_boundaries(e, n, b)
        out, anc = full(p, w, r, n, b, nwin, cps, interpret)
        span = jnp.max(o[1:] - o[:-1])
        return (jnp.sum(anc != idx),
                jnp.sum(jnp.any(out != ref, axis=1)), span)

    am, rm, span = check(parts, jnp.float32(rng.standard_normal()))
    tag = "OK" if int(am) == 0 and int(rm) == 0 else "FAIL"
    print(f"v6 b={b} nwin={nwin} cps={cps} n=2^{int(np.log2(n))}: anc mism "
          f"{int(am)}, row mism {int(rm)}, span {int(span)} -> {tag}",
          flush=True)
    return tag == "OK"


def measure(fn, parts, rng, calls=CALLS):
    float(fn(parts, jnp.float32(rng.standard_normal())))
    times = []
    for _ in range(calls):
        eps = jnp.float32(rng.standard_normal())
        t0 = time.perf_counter()
        float(fn(parts, eps))
        times.append((time.perf_counter() - t0) * 1e3)
    p10, med, p90 = np.percentile(times, [10, 50, 90])
    return f"median {med:7.3f}  [{p10:7.3f},{p90:7.3f}]"


def run_time(n, geometries):
    rng = np.random.default_rng(int(time.time() * 1000) % 2**31)
    parts = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)
    jax.block_until_ready(parts)

    @jax.jit
    def t_null(p_, eps):
        p, w, r = prep(p_, eps)
        return jnp.sum(p[0]) + jnp.sum(w, dtype=jnp.float32) * r

    print("null    ", measure(t_null, parts, rng), flush=True)

    @jax.jit
    def t_prep(p_, eps):
        # isolate the XLA work around the kernel: transpose-to-(8,n)
        # layout + ends + boundaries
        p, w, r = prep(p_, eps)
        e = ends_from_weights(w, r)
        o = chunk_boundaries(e, n, 128)
        p8t = to_p8t(p, e)
        return (jnp.sum(p8t, dtype=jnp.float32)
                + jnp.sum(o.astype(jnp.float32)))

    print("prep    ", measure(t_prep, parts, rng), flush=True)

    # kernel with the state already in transposed (8, n) layout and no
    # output transpose: what the filter pays if it keeps this layout
    pt0 = jnp.zeros((ROWS, n), jnp.float32).at[:5].set(
        jnp.asarray(np.random.default_rng(0).standard_normal((5, n)),
                    jnp.float32))

    for b, nwin, cps in geometries:
        @jax.jit
        def t_ktrans(pt_, eps, b=b, nwin=nwin, cps=cps):
            pt = pt_ + eps * 1e-9
            w = jnp.exp(4.0 * jnp.tanh(pt[0]) ** 2)
            r = jnp.abs(eps) % 1.0
            e = ends_from_weights(w, r)
            o = chunk_boundaries(e, n, b)
            p8t = pt.at[ENDS_ROW].set(e.astype(jnp.float32))
            if cps > 1:
                out_t, anc = v6_resample_cps(p8t, e, o, n, b, nwin, cps)
            else:
                out_t, anc = v6_resample(p8t, e, o, n, b, nwin)
            return (jnp.sum(out_t, dtype=jnp.float32)
                    + jnp.sum(anc.astype(jnp.float32)))

        print(f"ktrans b={b} nwin={nwin} cps={cps}",
              measure(t_ktrans, pt0, rng), flush=True)

    for b, nwin, cps in geometries:
        @jax.jit
        def t_v6(p_, eps, b=b, nwin=nwin, cps=cps):
            p, w, r = prep(p_, eps)
            out, anc = full(p, w, r, n, b, nwin, cps)
            return (jnp.sum(out, dtype=jnp.float32)
                    + jnp.sum(anc.astype(jnp.float32)))

        print(f"v6 b={b} nwin={nwin} cps={cps}",
              measure(t_v6, parts, rng), flush=True)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"platform={jax.devices()[0].platform}", flush=True)
    if stage in ("small", "all"):
        assert run_check(2**13, 128, 4, cps=8)
    if stage in ("big", "all"):
        assert run_check(2**20, 128, 4, cps=8)
    if stage in ("time", "all"):
        run_time(2**20, [(128, 4, 8), (128, 4, 16)])
    if stage in ("b256", "all"):
        # does the lane gather tolerate indices beyond one 128-lane tile?
        run_check(2**13, 256, 3, cps=1)


if __name__ == "__main__":
    main()
