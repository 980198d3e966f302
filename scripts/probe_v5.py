"""Probe v5: coarse-window resample with a Pallas local-gather kernel.

probe_v4.out findings at 2^20 (nets vs 23.6 ms null):
  ends 1.4 | +searchsorted boundaries 4.3 | scatterhint 10.9 (hints do
  NOT speed the seed scatter) | v4_taa 18.9 (batched take_along_axis is
  serial) | v4_onehot 12.0 (the (4096,256,512) one-hot einsum operand is
  2 GB of HBM traffic) | xla_full 17.0 (noisy; 9.7 in the 25-call sweep)

v5 changes exactly the two losing pieces:
  * boundaries via a two-level dense compare (sampled ends[::b] compare
    matrix + one coarse slice-gather refine) - no searchsorted, no
    scatter
  * the local gather as a tiny Pallas grid kernel over the pre-gathered
    (nch, w) windows: per chunk, cnt = #[window_ends < slot] and a
    (b,w)@(w,8) one-hot dot on the MXU - the one-hot lives only in VMEM

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_v5.py
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

N = 2**20
B = 256
W = 2 * B
CALLS = 25


def prep(p_, eps):
    p = p_ + eps * 1e-9
    w = jnp.exp(4.0 * jnp.tanh(p[:, 0]) ** 2)
    r = jnp.abs(eps) % 1.0
    return p, w, r


def ends_of(w, r, n):
    cs = jnp.cumsum(w)
    cs = cs / cs[-1]
    e = jnp.floor(n * cs - r).astype(jnp.int32)
    return jnp.clip(jax.lax.cummax(e), -1, n - 1)


def coarse_slices(a, starts, width):
    """Gather len(starts) contiguous slices of `width` rows from a."""
    if a.ndim == 1:
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
        sizes = (width,)
    else:
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
        sizes = (width, a.shape[1])
    return jax.lax.gather(
        a, starts[:, None], dn, slice_sizes=sizes,
        indices_are_sorted=True,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def boundaries2(ends, n, b):
    """o_i = #[ends < i*b] for i = 0..n/b, scatter/searchsorted-free.

    Level 1: j1 = #[ends[::b] < q] via a dense (n/b+1, n/b) compare.
    Level 2: count = s + #[ends[s:s+b] < q] with s = (j1-1)*b+1; entries
    past the level-1 bracket are >= q by sortedness, so no mask needed.
    """
    nch = n // b
    qs = jnp.arange(0, n + b, b, dtype=jnp.int32)  # (nch+1,)
    es = ends[::b]  # (nch,)
    j1 = jnp.sum((es[None, :] < qs[:, None]).astype(jnp.int32), axis=1)
    s = jnp.clip((j1 - 1) * b + 1, 0, n)
    big = jnp.int32(2**31 - 1)
    ends_pad = jnp.concatenate([ends, jnp.full((b,), big, jnp.int32)])
    win = coarse_slices(ends_pad, s, b)  # (nch+1, b)
    return s + jnp.sum((win < qs[:, None]).astype(jnp.int32), axis=1)


CPS = 8  # chunks per grid step (satisfies the (8, 128) block tiling)


def _local_kernel(ew_ref, pw_ref, o_ref, out_ref, anc_ref, *, b, w, cps):
    i = pl.program_id(0)
    for k in range(cps):  # static unroll over the sub-chunks
        slot = (
            jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
            + (i * cps + k) * b
        )
        ew = ew_ref[k]  # (w,) int32
        lt = (ew[None, :] < slot).astype(jnp.int32)  # (b, w)
        cnt = jnp.sum(lt, axis=1, keepdims=True)  # (b, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
        onehot = jnp.where(col == cnt, 1.0, 0.0)
        out_ref[k] = jax.lax.dot_general(
            onehot, pw_ref[k],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        anc_ref[k] = (cnt + o_ref[k, 0])[:, 0]


def local_gather_pallas(ew, pw, o, b, w, interpret=False):
    """ew (nch, w) int32, pw (nch, w, cols) f32, o (nch,) window starts
    -> (nch, b, cols) resampled rows + (nch, b) global ancestors."""
    nch, _, cols = pw.shape
    cps = CPS
    assert nch % cps == 0
    kernel = functools.partial(_local_kernel, b=b, w=w, cps=cps)
    # transpose pw to (nch, cols, w) so the dot contracts the minor dim
    pwt = jnp.swapaxes(pw, 1, 2)
    out, anc = pl.pallas_call(
        kernel,
        grid=(nch // cps,),
        in_specs=[
            pl.BlockSpec((cps, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cps, cols, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cps, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((cps, b, cols), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cps, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nch, b, cols), jnp.float32),
            jax.ShapeDtypeStruct((nch, b), jnp.int32),
        ],
        interpret=interpret,
    )(ew, pwt, o[:, None])
    return out, anc


def v5_resample(p, ends, o, n, b, w, interpret=False):
    nch = n // b
    big = jnp.int32(2**31 - 1)
    ends_pad = jnp.concatenate([ends, jnp.full((w,), big, jnp.int32)])
    p_pad = jnp.concatenate([p, jnp.zeros((w, p.shape[1]), p.dtype)])
    cols = 8
    p8 = jnp.zeros((p_pad.shape[0], cols), jnp.float32).at[:, : p.shape[1]].set(
        p_pad.astype(jnp.float32))
    starts = o[:-1]
    ew = coarse_slices(ends_pad, starts, w)  # (nch, w)
    pw = coarse_slices(p8, starts, w)  # (nch, w, 8)
    out, anc = local_gather_pallas(ew, pw, starts, b, w, interpret=interpret)
    return (out.reshape(n, cols)[:, : p.shape[1]].astype(p.dtype),
            anc.reshape(n))


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


def main():
    print(f"platform={jax.devices()[0].platform} N=2^20 B={B} W={W}", flush=True)
    seed = int(time.time() * 1000) % (2**31)
    rng = np.random.default_rng(seed)
    parts = jnp.asarray(rng.standard_normal((N, 5)), jnp.float32)
    jax.block_until_ready(parts)

    @jax.jit
    def t_null(p_, eps):
        p, w, r = prep(p_, eps)
        return jnp.sum(p[0]) + jnp.sum(w, dtype=jnp.float32) * r

    @jax.jit
    def t_bnd2(p_, eps):
        p, w, r = prep(p_, eps)
        e = ends_of(w, r, N)
        o = boundaries2(e, N, B)
        return (jnp.sum(e.astype(jnp.float32)) + jnp.sum(o.astype(jnp.float32))
                + p[0, 0])

    @jax.jit
    def t_coarse(p_, eps):
        p, w, r = prep(p_, eps)
        e = ends_of(w, r, N)
        o = boundaries2(e, N, B)
        big = jnp.int32(2**31 - 1)
        ends_pad = jnp.concatenate([e, jnp.full((W,), big, jnp.int32)])
        p_pad = jnp.concatenate([p, jnp.zeros((W, p.shape[1]), p.dtype)])
        ew = coarse_slices(ends_pad, o[:-1], W)
        pw = coarse_slices(p_pad, o[:-1], W)
        return (jnp.sum(ew.astype(jnp.float32)) + jnp.sum(pw)
                + jnp.sum(o.astype(jnp.float32)))

    @jax.jit
    def t_v5(p_, eps):
        p, w, r = prep(p_, eps)
        e = ends_of(w, r, N)
        o = boundaries2(e, N, B)
        out, anc = v5_resample(p, e, o, N, B, W)
        return jnp.sum(out, dtype=jnp.float32) + jnp.sum(anc.astype(jnp.float32))

    @jax.jit
    def check(p_, eps):
        p, w, r = prep(p_, eps)
        idx = jax.lax.optimization_barrier(systematic_resample_indices(w, r))
        ref = sorted_row_gather(p, idx)
        e = ends_of(w, r, N)
        o = boundaries2(e, N, B)
        # boundary correctness vs searchsorted
        qs = jnp.arange(0, N + B, B, dtype=jnp.int32)
        o_ref = jnp.searchsorted(e, qs, side="left").astype(jnp.int32)
        out, anc = v5_resample(p, e, o, N, B, W)
        return (jnp.sum(o != o_ref), jnp.sum(anc != idx),
                jnp.sum(jnp.any(out != ref, axis=1)),
                jnp.max(o[1:] - o[:-1]))

    bm, am, rm, span = check(parts, jnp.float32(rng.standard_normal()))
    print(f"check: bnd mism {int(bm)}, anc mism {int(am)}, row mism {int(rm)},"
          f" max span {int(span)} (guard < {W})", flush=True)

    for name, fn in [
        ("null   ", t_null),
        ("bnd2   ", t_bnd2),
        ("coarse ", t_coarse),
        ("v5     ", t_v5),
    ]:
        print(name, measure(fn, parts, rng), flush=True)


if __name__ == "__main__":
    main()
