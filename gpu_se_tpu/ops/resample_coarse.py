"""Coarse-window systematic resample (the round-3 "v6" formulation).

Exploits the one structural fact the merge-scan kernels
(``resample_pallas{,2,3,_block}``) under-use: systematic-resampling
ancestors are NONDECREASING, so output chunk ``i`` of ``b`` slots draws
only from source rows near ``o_i = #{ends < i*b}``. The pipeline:

1. ``ends`` — the monotonized integer segment ends, the exact object the
   XLA path scatters (filters/resampling.py:52-59) → bitwise parity by
   construction.
2. ``chunk_boundaries`` — all ``o_i`` via a two-level dense compare
   against the sampled ``ends[::b]`` (no scatter, no searchsorted; a
   4097-query ``searchsorted`` costs ~3 ms at 2^20, this ~0.2 ms).
3. A Pallas kernel whose window blocks are fetched by Mosaic's own
   pipeline through scalar-prefetched block index maps
   (``jblk[i] = o_i // b``), with the local gather done by
   ``tpu.dynamic_gather`` (``take_along_axis``) — no one-hot matmul
   (whose 128-lane N-padding × 6 HIGHEST passes costs ~4 ms at 2^20),
   no XLA slice-gather (~8 ms: XLA lowers it as a serial loop).

Mosaic layout rules baked in (each cost one failed device compile):
no lane-dim concatenates across tiles; ``dynamic_gather`` indices stay
inside one 128-lane tile (hence ``b = 128`` and per-block ``within``
offsets); f32 iota unsupported (build int32, convert); ends ride the
payload as an f32 row (exact for values < 2^25, i.e. any n ≤ 2^24 —
the reference's own maximum, tests/ParallelParticleFilter_test.py:5).

Degenerate weight concentrations can push a chunk's ancestor span past
the window; a ``lax.cond`` falls back to the exact scatter+cummax path
fed the SAME ``ends``, so the result is bitwise identical either way.

Measured honestly (k-chain slope, scripts/probe_v7.out): the full PF
step at 2^20 is 11.8 ms with this kernel vs 9.3 ms with the v1 merge
kernel and 12.5 ms with pure XLA — the per-chunk pipeline machinery
(~1.2 us × 8192 chunks) dominates its ~100 ns of VPU work, so the v1
kernel remains the production default. Kept as the most TPU-idiomatic
formulation and the base for future work; scripts/probe_v8.py holds the
overhead attribution.

Reference role: /root/reference/filter/particle.py:296-316 (CUDA
resample kernel) and gs_ukf.py:409-436 (its Gaussian-bank duplicate —
here any pytree ≤ 6 payload rows rides in one pass).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8       # sublane tile: payload rows 0..5, ends row 6, spare 7
ENDS_ROW = 6   # input row carrying ends as exact f32
CNT_ROW = 6    # output row carrying in-window ancestor offsets
BLOCK = 128    # output chunk slots == source block == one lane tile
NWIN = 4       # window blocks per chunk (span guard: 3*BLOCK)
CPS = 16       # chunks per grid step


def ends_from_weights(weights: jax.Array, r: jax.Array) -> jax.Array:
    """Monotonized integer segment ends — identical to the prep of the
    XLA index formulation (filters/resampling.py:44-59)."""
    n = weights.shape[0]
    cumsum = jnp.cumsum(weights)
    cumsum = cumsum / cumsum[-1]
    ends = jnp.floor(n * cumsum - r).astype(jnp.int32)
    ends = jax.lax.cummax(ends)
    return jnp.clip(ends, -1, n - 1)


def indices_from_ends(ends: jax.Array) -> jax.Array:
    """Exact ancestor indices from ``ends`` via scatter + cummax (the
    XLA formulation; see filters/resampling.py:60-70)."""
    n = ends.shape[0]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1] + 1])
    valid = starts <= ends
    ks = jnp.arange(n, dtype=jnp.int32)
    seed = (
        jnp.zeros(n, jnp.int32)
        .at[jnp.where(valid, starts, n)]
        .max(jnp.where(valid, ks, 0), mode="drop")
    )
    return jax.lax.cummax(seed)


def _coarse_slices(a: jax.Array, starts: jax.Array, width: int) -> jax.Array:
    """Gather ``len(starts)`` contiguous slices of ``width`` rows.
    NOTE: XLA lowers this as a serial per-slice loop on TPU (~2 us per
    slice measured) — only use for FEW slices (chunk_boundaries' n/b)."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
    return jax.lax.gather(
        a, starts[:, None], dn, slice_sizes=(width,),
        indices_are_sorted=True,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def chunk_boundaries(ends: jax.Array, n: int, b: int) -> jax.Array:
    """``o_i = #{ends < i*b}`` for ``i = 0..n/b``, scatter/searchsorted-
    free: level 1 brackets each boundary with a dense compare against
    the sampled ``ends[::b]``; level 2 refines with one coarse
    slice-gather. Entries past the level-1 bracket are >= the query by
    sortedness, so the fixed-width refine window needs no mask."""
    qs = jnp.arange(0, n + b, b, dtype=jnp.int32)  # (n/b + 1,)
    es = ends[::b]  # (n/b,)
    j1 = jnp.sum((es[None, :] < qs[:, None]).astype(jnp.int32), axis=1)
    s = jnp.clip((j1 - 1) * b + 1, 0, n)
    big = jnp.int32(2**31 - 1)
    ends_pad = jnp.concatenate([ends, jnp.full((b,), big, jnp.int32)])
    win = _coarse_slices(ends_pad, s, b)  # (n/b + 1, b)
    return s + jnp.sum((win < qs[:, None]).astype(jnp.int32), axis=1)


def _kernel(jblk_ref, *refs, b, nwin, cps):
    out_ref = refs[cps * nwin]
    i = pl.program_id(0)
    for k in range(cps):  # static unroll
        blocks = [r[...] for r in refs[k * nwin:(k + 1) * nwin]]
        slot = (
            jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
            + (i * cps + k) * b
        ).astype(jnp.float32)
        cnt_sub = jnp.zeros((b, 1), jnp.float32)
        for t in range(nwin):
            ew = blocks[t][ENDS_ROW:ENDS_ROW + 1, :]  # (1, b) ends-f32
            lt = (ew < slot).astype(jnp.float32)  # (b, b)
            cnt_sub = cnt_sub + jnp.sum(lt, axis=1, keepdims=True)
        cnt_l = jnp.transpose(cnt_sub, (1, 0))  # (1, b) lane-oriented
        rows = jnp.zeros((ROWS, b), jnp.float32)
        for t in range(nwin):
            within = jnp.clip(cnt_l - t * b, 0.0, b - 1.0).astype(jnp.int32)
            idx = jnp.broadcast_to(within, (ROWS, b))
            g = jnp.take_along_axis(blocks[t], idx, axis=1)  # lane gather
            sel = (cnt_l >= t * b) & (cnt_l < (t + 1) * b)
            rows = jnp.where(jnp.broadcast_to(sel, (ROWS, b)), g, rows)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, b), 0)
        out_ref[:, k * b:(k + 1) * b] = jnp.where(
            rowi == CNT_ROW, jnp.broadcast_to(cnt_l, (ROWS, b)), rows)


def coarse_kernel(p8t: jax.Array, o: jax.Array, n: int,
                  interpret: bool = False):
    """Run the window kernel. ``p8t`` is the (ROWS, n) transposed
    payload with ends-f32 in ENDS_ROW; ``o`` the (n/BLOCK + 1,) chunk
    boundaries. Returns ``(out_t (ROWS, n), anc (n,) int32)``."""
    b, nwin, cps = BLOCK, NWIN, CPS
    nch = n // b
    npad = n + nwin * b
    nblk_tot = npad // b
    bigf = jnp.float32(2.0 ** 25)
    pad = jnp.zeros((ROWS, nwin * b), jnp.float32).at[ENDS_ROW].set(bigf)
    p_pad = jnp.concatenate([p8t, pad], axis=1)
    jblk = jnp.clip(o[:-1] // b, 0, nblk_tot - nwin).astype(jnp.int32)

    kernel = functools.partial(_kernel, b=b, nwin=nwin, cps=cps)
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


def coarse_applicable(pytree, n: int) -> bool:
    """Payload must fit the 6 free rows, survive the f32 packing round
    trip exactly (the kernel carries every leaf as float32 — int32/f64
    leaves would be silently degraded), and n must tile whole grid
    steps (BLOCK * CPS)."""
    from gpu_se_tpu.filters.resampling import f32_exact_dtype

    leaves = jax.tree_util.tree_leaves(pytree)
    if not leaves:
        return False
    total = 0
    for leaf in leaves:
        if leaf.ndim < 2 or leaf.shape[0] != n:
            return False
        if not f32_exact_dtype(leaf.dtype):
            return False
        total += int(np.prod(leaf.shape[1:]))
    return total <= ENDS_ROW and n % (BLOCK * CPS) == 0 and n >= 2**13


def coarse_systematic_resample(
    pytree, weights: jax.Array, r: jax.Array, interpret: bool = False,
):
    """Resample a pytree of (N, ...) arrays; returns (pytree, ancestors).

    Bitwise identical to the XLA path for ANY weights *given f32-exact
    leaf dtypes* (every leaf rides the payload as float32; use
    ``coarse_applicable`` to gate — int32 values beyond 2^24 or float64
    payloads would be silently degraded): the coarse-window branch runs
    when every per-chunk ancestor span fits the window; a ``lax.cond``
    falls back to the exact scatter+cummax path (fed the same ``ends``)
    on degenerate concentrations.
    """
    from gpu_se_tpu.filters.resampling import sorted_row_gather

    leaves, treedef = jax.tree_util.tree_flatten(pytree)
    n = weights.shape[0]
    mats = [leaf.reshape(n, -1).astype(jnp.float32) for leaf in leaves]
    shapes = [leaf.shape for leaf in leaves]
    dtypes = [leaf.dtype for leaf in leaves]
    packed = jnp.concatenate(mats, axis=1) if len(mats) > 1 else mats[0]
    nx = packed.shape[1]
    assert nx <= ENDS_ROW, f"payload of {nx} cols exceeds {ENDS_ROW}"

    ends = ends_from_weights(weights, r)
    o = chunk_boundaries(ends, n, BLOCK)
    # chunk i's window covers [jblk*B, jblk*B + NWIN*B); its last
    # ancestor is <= o_{i+1}; jblk*B > o_i - B  =>  guard:
    overflow = jnp.max(o[1:] - o[:-1]) > (NWIN - 1) * BLOCK - BLOCK

    def fast(packed, ends, o):
        p8t = jnp.zeros((ROWS, n), jnp.float32)
        p8t = p8t.at[:nx].set(packed.T)
        p8t = p8t.at[ENDS_ROW].set(ends.astype(jnp.float32))
        out_t, anc = coarse_kernel(p8t, o, n, interpret=interpret)
        return out_t[:nx].T, anc

    def slow(packed, ends, o):
        idx = jax.lax.optimization_barrier(indices_from_ends(ends))
        return sorted_row_gather(packed, idx), idx

    out, anc = jax.lax.cond(overflow, slow, fast, packed, ends, o)

    res, col = [], 0
    for shape, dtype in zip(shapes, dtypes):
        width = int(np.prod(shape[1:]))
        res.append(out[:, col:col + width].reshape(shape).astype(dtype))
        col += width
    return jax.tree_util.tree_unflatten(treedef, res), anc
