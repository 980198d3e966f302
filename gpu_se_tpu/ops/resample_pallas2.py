"""Pallas TPU v2: work-optimal fused systematic resample.

Replaces both halves of the XLA resample hot path at 2^20 (slope-measured
on v5e: scatter+cummax ancestor indices ~8.4 ms + sorted row gather
~5.3 ms) and the v1 merge kernel (ops/resample_pallas.py, ~12 ms: its
while-loop issues one synchronous DMA wait per visited window). The v1
merge is unavoidably latency-bound because chunk->window mapping is
data-dependent; v2 removes the data dependence by bounding every window
through COMPACTION:

  XLA pre     cum = cumsum(w)/total; ends_k = floor(n*cs_k - r);
              C_k = ends_k + 1 (cumulative output count); flag_k = this
              particle has >= 1 output slot. Ancestor of slot i is the
              rank #{survivor j: C_j <= i} — identical bits to the
              scatter+cummax formulation (same cum, same ends).

  kernel 1    stream compaction: pack survivor columns [x(5); C; flag; 0]
  (compact)   of an (8, N) lane-major stream. Fixed grid over W-wide
              windows (auto-pipelined input blocks), pack via a one-hot
              (W, W+128) MXU matmul, write W+128 columns to HBM at the
              128-aligned running total with a <=127-column tail-replay
              carry (a single (8,128) VMEM tile) — the unaligned-offset
              writes that would otherwise be illegal become full-tile
              overwrites of garbage the next window rewrites.

  XLA glue    mask columns >= n_surv to C=+inf; chunk_lo[c] =
              #{C <= c*B} by fused compare-reduce (the survivor window
              of output chunk c is [chunk_lo[c], chunk_lo[c]+B] — BOUNDED
              because survivors each own >= 1 slot).

  kernel 2    expansion: fixed grid over B-slot output chunks; the (8,
  (expand)    W_exp) survivor window starts at the scalar-prefetched
              128-aligned chunk_lo[c] (double-buffered manual DMA); each
              slot's ancestor is a lane count + one-hot (B, W_exp) @
              (W_exp, 8) MXU gather. No while loops anywhere.

Output ancestors are BIT-IDENTICAL to
filters.resampling.systematic_resample_indices (same cumsum floats, same
boundary arithmetic), so this is a drop-in for the gather fast path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2.0 ** 30  # > any slot index; C values are < 2^24


def _lane_cumsum(x, w):
    """Inclusive cumsum along the lane axis of (1, w) — Hillis-Steele
    log-step scan from concat+slice (Mosaic has no cumsum primitive)."""
    s = x
    k = 1
    while k < w:
        s = s + jnp.concatenate(
            [jnp.zeros((1, k), s.dtype), s[:, : w - k]], axis=1
        )
        k *= 2
    return s


# ----------------------------------------------------------------------
# kernel 1: stream compaction
# ----------------------------------------------------------------------
def _compact_kernel(vals_ref, out_hbm, staging, carry, total_ref, sems,
                    *, w, wd, n_windows):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        total_ref[0] = 0
        carry[...] = jnp.zeros_like(carry)

    total = total_ref[0]
    t = total % 128
    aligned = pl.multiple_of(total - t, 128)

    flag = vals_ref[6:7, :]  # (1, w) 0/1 f32
    p_incl = _lane_cumsum(flag, w)  # (1, w) inclusive survivor count
    n_real = p_incl[0, w - 1].astype(jnp.int32)

    # destination column (within staging) per source column; build the
    # one-hot as (wd, w) so dest/flag stay on the LANE axis (a (1,w) ->
    # (w,1) reindex is a lane->sublane transpose Mosaic cannot lower)
    dest = t.astype(jnp.float32) + p_incl - 1.0  # (1, w)
    row_d = jax.lax.broadcasted_iota(jnp.int32, (wd, w), 0).astype(jnp.float32)
    m = jnp.where((row_d == dest) & (flag > 0.0), 1.0, 0.0)  # (wd, w)
    packed = jax.lax.dot_general(
        vals_ref[:], m,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (8, wd)

    # prepend the replayed tail of the previous partial tile
    col8 = jax.lax.broadcasted_iota(jnp.int32, (8, wd), 1)
    carry_wide = jnp.concatenate(
        [carry[...], jnp.zeros((8, wd - 128), jnp.float32)], axis=1
    )
    staging_vals = packed + jnp.where(col8 < t, carry_wide, 0.0)

    slot = j % 2

    def write_dma(s, offset):
        return pltpu.make_async_copy(
            staging.at[s],
            out_hbm.at[:, pl.ds(offset, wd)],
            sems.at[s],
        )

    # stores/loads with a TRACED buffer index lower to unsupported
    # gathers on TPU — unroll the parity instead
    @pl.when(slot == 0)
    def _():
        staging[0] = staging_vals

    @pl.when(slot == 1)
    def _():
        staging[1] = staging_vals

    # consecutive writes OVERLAP (the tail-replay region): write j-1's
    # trailing garbage must not land after write j's valid bytes, so only
    # one write may be in flight — wait it out just before issuing ours
    # (it was started a full compute step ago: near-zero stall)
    @pl.when(j >= 1)
    def _():
        write_dma(1 - slot, aligned).wait()

    write_dma(slot, aligned).start()

    # new tail carry: columns [floor128(new_total)-aligned, +128)
    new_total = total + n_real
    offs = (new_total // 128) * 128 - aligned  # multiple of 128, in [0, w]
    ds = pl.ds(pl.multiple_of(offs, 128), 128)
    carry[...] = jnp.where(slot == 0, staging[0, :, ds], staging[1, :, ds])
    total_ref[0] = new_total

    @pl.when(j == n_windows - 1)
    def _():
        write_dma(slot, aligned).wait()


def _compact(vals8, n_pad, window, interpret=False):
    """vals8 (8, N) -> packed survivor stream (8, n_pad)."""
    n = vals8.shape[1]
    w = window
    wd = w + 128
    assert n % w == 0
    kernel = functools.partial(
        _compact_kernel, w=w, wd=wd, n_windows=n // w
    )
    (out,) = pl.pallas_call(
        kernel,
        grid=(n // w,),
        in_specs=[
            pl.BlockSpec((8, w), lambda j: (0, j), memory_space=pltpu.VMEM)
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((8, n_pad), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((2, 8, wd), jnp.float32),  # staging (double-buffered)
            pltpu.VMEM((8, 128), jnp.float32),  # tail-replay carry
            pltpu.SMEM((1,), jnp.int32),  # running survivor total
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(vals8)
    return out


# ----------------------------------------------------------------------
# kernel 2: expansion (bounded-window one-hot gather)
# ----------------------------------------------------------------------
def _expand_kernel(lo_ref, stream_ref, out_ref, buf, sems,
                   *, b, w_exp, n_chunks):
    c = pl.program_id(0)

    def read_dma(slot, cc):
        start = pl.multiple_of(lo_ref[cc], 128)
        return pltpu.make_async_copy(
            stream_ref.at[:, pl.ds(start, w_exp)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(c == 0)
    def _():
        read_dma(0, 0).start()

    @pl.when(c + 1 < n_chunks)
    def _():
        read_dma((c + 1) % 2, c + 1).start()

    read_dma(c % 2, c).wait()
    win = jnp.where(c % 2 == 0, buf[0], buf[1])  # (8, w_exp)

    c_vals = win[5:6, :]  # (1, w_exp) survivor cumulative counts (or BIG)
    i_vals = (
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0).astype(jnp.float32)
        + (c * b).astype(jnp.float32)
    )  # (b, 1) global slot index
    # local rank: #{window entries with C <= i}; entries before the window
    # all satisfy C <= c*B <= i, entries after are > (c+1)*B > i
    le = jnp.where(c_vals <= i_vals, 1.0, 0.0)  # (b, w_exp)
    rank = jnp.sum(le, axis=1, keepdims=True)  # (b, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, w_exp), 1).astype(jnp.float32)
    hit = jnp.where(col == rank, 1.0, 0.0)
    out_ref[:] = jax.lax.dot_general(
        hit, win,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (b, 8): cols 0-4 gathered states, col 5 the ancestor's C


def _expand(stream, lo_aligned, n, block, w_exp, interpret=False):
    b = block
    n_chunks = n // b
    kernel = functools.partial(
        _expand_kernel, b=b, w_exp=w_exp, n_chunks=n_chunks
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((b, 8), lambda c, lo: (c, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 8, w_exp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
        interpret=interpret,
    )(lo_aligned, stream)


# ----------------------------------------------------------------------
def fused_systematic_resample_v2(
    particles: jax.Array, weights: jax.Array, r: jax.Array,
    window: int = 1024, block: int = 1024, interpret: bool = False,
):
    """Systematic resample (search + gather fused): returns resampled
    particles, bit-identical ancestors to the XLA scatter+cummax path.

    Constraints: N % window == 0, N % block == 0, Nx <= 5 (stream packs
    5 state lanes + C + flag; extend the layout for wider states).
    """
    n, nx = particles.shape
    assert nx <= 5, "stream layout packs up to 5 state dims"
    w_exp = ((block + 1 + 127 + 127) // 128 + 1) * 128  # bound + align slack
    n_pad = n + w_exp + 2 * window + 256

    cum = jnp.cumsum(weights.astype(jnp.float32))
    cum = cum / cum[-1]
    # cummax matches filters.resampling.systematic_resample_indices: the
    # TPU tree cumsum is locally non-monotone by an ulp and the kernel's
    # rank formulation needs sorted survivor boundaries
    ends = jax.lax.cummax(jnp.floor(n * cum - r))
    ends = jnp.clip(ends, -1.0, n - 1.0)
    c_incl = ends + 1.0
    prev = jnp.concatenate([jnp.zeros(1, c_incl.dtype), c_incl[:-1]])
    flags = (c_incl > prev).astype(jnp.float32)
    n_surv = jnp.sum(flags).astype(jnp.int32)

    vals8 = jnp.concatenate(
        [
            particles.astype(jnp.float32).T,
            jnp.zeros((5 - nx, n), jnp.float32),
            c_incl[None, :],
            flags[None, :],
            jnp.zeros((1, n), jnp.float32),
        ],
        axis=0,
    )  # (8, N)

    stream = _compact(vals8, n_pad, window, interpret=interpret)

    # mask garbage beyond the survivor count: C -> BIG, values -> 0
    col = jnp.arange(n_pad, dtype=jnp.int32)[None, :]
    row = jnp.arange(8, dtype=jnp.int32)[:, None]
    pad_template = jnp.where(row == 5, jnp.float32(_BIG), 0.0)
    stream = jnp.where(col < n_surv, stream, pad_template)

    # survivor window starts per output chunk, 128-aligned
    c_vec = stream[5]  # sorted: survivor C values then BIG padding
    bounds = (jnp.arange(n // block, dtype=jnp.float32) * block)
    chunk_lo = jnp.sum(
        (c_vec[None, :] <= bounds[:, None]).astype(jnp.int32), axis=1
    )
    lo_aligned = jnp.minimum(
        (chunk_lo // 128) * 128, n_pad - w_exp
    ).astype(jnp.int32)

    out = _expand(stream, lo_aligned, n, block, w_exp, interpret=interpret)
    return out[:, :nx].astype(particles.dtype)
