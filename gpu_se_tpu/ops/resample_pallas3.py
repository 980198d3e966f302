"""Pallas TPU kernel: fused systematic resampling, DMA-pipelined (v3).

Same merge algorithm as :mod:`gpu_se_tpu.ops.resample_pallas` (v1) — the
TPU-native replacement for the reference's CUDA resample pipeline
(/root/reference/filter/particle.py:296-316) — restructured so the v1
kernel's one identified cost (~2.9 us of synchronous DMA wait per window
visit, ~8.5 ms at 2^20) is overlapped with compute. Design intent (see
the calibrated measurements in scripts/probe_v3_time.out for what the
pipelining actually buys on device):

* **Double buffering.** Two (cs, particles) window buffers; while the
  VPU/MXU consume window ``k`` the DMA engine fills window ``k+1``.
  Within a chunk the next window is always ``start + w`` (the merge scan
  is sequential), so the prefetch address is exact, never speculative.
* **Cross-chunk residency.** Chunk ``i+1`` resumes its scan at the
  window holding chunk ``i``'s last ancestor — which is by construction
  the window chunk ``i`` finished on (the scan stops at the first window
  whose cumsum tail reaches ``u_max``). That window is already resident,
  and its successor is already in flight, so the per-chunk warm-up fetch
  of v1 (n/b extra synchronous round trips — the *majority* of visits at
  a b=128 < w=256 geometry) is avoided by construction; only chunk 0
  pays a cold fetch.

Invariants (the kernel deadlocks if ever violated — see CLAUDE.md on
wedged relays, so they are spelled out):
  loop entry:  buffer ``cur``   = window ``start``      RESIDENT (waited)
               buffer ``1-cur`` = window ``start + w``  IN FLIGHT
  chunk exit:  identical, with ``start`` = the chunk's final window,
               recorded in SMEM for the next chunk.
The final grid step waits the dangling in-flight copy so no DMA
semaphore is live at kernel exit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(r_ref, cs_hbm, parts_hbm, anc_ref, out_ref,
            kbase_ref, cur_ref, cs_win, parts_win, sems,
            *, n, n_lim, b, w, nx, nchunks):
    i = pl.program_id(0)

    def cs_copy(start, slot):
        start = pl.multiple_of(start, w)
        return pltpu.make_async_copy(
            cs_hbm.at[:, pl.ds(start, w)], cs_win.at[slot], sems.at[slot, 0]
        )

    def parts_copy(start, slot):
        start = pl.multiple_of(start, w)
        return pltpu.make_async_copy(
            parts_hbm.at[:, pl.ds(start, w)], parts_win.at[slot], sems.at[slot, 1]
        )

    @pl.when(i == 0)
    def _():
        kbase_ref[0] = 0
        cur_ref[0] = 0
        cs_copy(0, 0).start()
        parts_copy(0, 0).start()
        cs_copy(w, 1).start()
        parts_copy(w, 1).start()
        cs_copy(0, 0).wait()
        parts_copy(0, 0).wait()

    r = r_ref[0]
    slot = (
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0) + i * b
    ).astype(jnp.float32)
    u = (slot + r) / jnp.float32(n)  # (b, 1)
    u_max = jnp.max(u)

    def body(carry):
        start, cur, counts, acc, finalized, _done = carry
        cs_row = cs_win[cur]  # (1, w)
        lt = (cs_row < u).astype(jnp.int32)  # (b, w)
        c_in = jnp.sum(lt, axis=1, keepdims=True)  # (b, 1) relative count
        col = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
        # float32 0/1 masks throughout: Mosaic cannot carry i1 vectors
        # through scf.while yields
        open_mask = 1.0 - finalized  # (b, 1) slots still searching
        hits = (
            jnp.where(col == c_in, 1.0, 0.0)
            * jnp.where(c_in < w, 1.0, 0.0)
            * open_mask
        )
        acc = acc + jax.lax.dot_general(
            hits, parts_win[cur],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # exact gather, no bf16 passes
        )
        counts = counts + c_in
        finalized = jnp.maximum(finalized, jnp.where(c_in < w, 1.0, 0.0))
        done = jnp.where(
            (cs_row[0, w - 1] >= u_max) | (start + w >= n_lim), 1, 0
        ).astype(jnp.int32)

        # advance the pipeline only if another window is needed: retire
        # the in-flight copy of start+w, then refill the just-consumed
        # buffer with start+2w (reads of buffer ``cur`` above are ordered
        # before this overwrite by ref dependency)
        @pl.when(done == 0)
        def _():
            cs_copy(start + w, 1 - cur).wait()
            parts_copy(start + w, 1 - cur).wait()
            cs_copy(start + 2 * w, cur).start()
            parts_copy(start + 2 * w, cur).start()

        nstart = jnp.where(done == 0, start + w, start)
        ncur = jnp.where(done == 0, 1 - cur, cur)
        return nstart, ncur, counts, acc, finalized, done

    def cond(carry):
        return carry[5] == 0

    start0 = kbase_ref[0]
    cur0 = cur_ref[0]
    counts0 = jnp.zeros((b, 1), jnp.int32) + start0  # entries before start0 all < u
    acc0 = jnp.zeros((b, 8), jnp.float32)
    finalized0 = jnp.zeros((b, 1), jnp.float32)
    fstart, fcur, counts, acc, _, _ = jax.lax.while_loop(
        cond, body,
        (start0, cur0, counts0, acc0, finalized0, jnp.asarray(0, jnp.int32)),
    )

    ancestors = jnp.clip(counts, 0, n - 1)
    anc_ref[:] = ancestors
    out_ref[:] = acc[:, :nx]
    # the final window is w-aligned by construction and is exactly the
    # window holding this chunk's last ancestor (the scan stops at the
    # first window whose tail reaches u_max); the next chunk resumes there
    kbase_ref[0] = fstart
    cur_ref[0] = fcur

    # retire the dangling prefetch so no DMA semaphore is live at exit
    @pl.when(i == nchunks - 1)
    def _():
        cs_copy(fstart + w, 1 - fcur).wait()
        parts_copy(fstart + w, 1 - fcur).wait()


def pallas_systematic_resample_pipelined(
    particles: jax.Array, weights: jax.Array, r: jax.Array,
    block_slots: int = 128, window: int = 256, interpret: bool = False,
):
    """Fused systematic resample: returns (resampled_particles, ancestors).

    Semantics identical to
    :func:`gpu_se_tpu.ops.resample_pallas.pallas_systematic_resample`
    (and to ``systematic_resample_indices`` + row gather).
    """
    n, nx = particles.shape
    b, w = block_slots, window
    assert n % b == 0, "particle count must be a multiple of block_slots"
    # B=2048/W=256 deadlocks v1 on real TPU (wedges the relay ~5 min, see
    # CLAUDE.md); v3 shares the window-scan structure, so guard it too.
    assert b < 2048, f"block_slots={b} is a known-deadlock geometry on TPU"

    cs = jnp.cumsum(weights.astype(jnp.float32))
    cs = cs / cs[-1]
    # monotonize the TPU tree cumsum's ulp dips so the window-count
    # invariants hold exactly and v1/v3/XLA agree bitwise
    cs = jax.lax.cummax(cs)
    n_win = ((n + w - 1) // w) * w
    n_lim = n_win + w  # scan stop bound (matches v1's n_pad)
    n_alloc = n_win + 2 * w  # + slack for the depth-1 prefetch
    cs_padded = jnp.concatenate([cs, jnp.full((n_alloc - n,), 2.0, cs.dtype)])
    cs_padded = cs_padded.reshape(1, n_alloc)
    # (8, n_alloc): transposed so the manual DMA slices the 128-aligned
    # lane dim, and sublane-padded to the (8, 128) float32 tile
    parts_padded = jnp.zeros((8, n_alloc), jnp.float32)
    parts_padded = parts_padded.at[:nx, :n].set(particles.astype(jnp.float32).T)

    kernel = functools.partial(
        _kernel, n=n, n_lim=n_lim, b=b, w=w, nx=nx, nchunks=n // b
    )
    anc, out = pl.pallas_call(
        kernel,
        grid=(n // b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # r
            pl.BlockSpec(memory_space=pltpu.HBM),  # cumsum
            pl.BlockSpec(memory_space=pltpu.HBM),  # particles
        ],
        out_specs=[
            pl.BlockSpec((b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, nx), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),  # carry: resident window start
            pltpu.SMEM((1,), jnp.int32),  # carry: resident buffer slot
            pltpu.VMEM((2, 1, w), jnp.float32),  # cumsum windows (2 slots)
            pltpu.VMEM((2, 8, w), jnp.float32),  # particle windows (2 slots)
            pltpu.SemaphoreType.DMA((2, 2)),  # [slot, {cs, parts}]
        ],
        interpret=interpret,
    )(jnp.asarray(r, jnp.float32).reshape(1), cs_padded, parts_padded)
    return out, anc[:, 0]
