"""Pallas TPU kernel: fused systematic resampling (search + gather).

This is the TPU-native replacement for the reference's hand-written CUDA
resampling pipeline (torch cumsum -> Nicely search kernel -> fancy-index
gather, /root/reference/filter/particle.py:296-316) and the framework's
answer to the XLA scatter bottleneck (the pure-XLA formulation spends
~12 ms at 2^20 in scatter/gather).

Algorithm: a merge of two sorted sequences — the normalized weight cumsum
``cs`` and the stratified positions ``u_i = (i + r) / N``. The grid walks
output-slot chunks of size B sequentially (TPU grids are sequential), and
a carry in SMEM tracks the particle-window start; each chunk streams
W-wide windows of ``cs`` and of the particle rows from HBM, counts
``#{cs < u_i}`` with a (B, W) compare on the VPU, and gathers ancestor
rows with a one-hot (B, W) @ (W, nx) matmul on the MXU — no scatter, no
sort, every element touched O(1) times (amortized across chunks).

Status: numerically exact (validated against the XLA formulation on real
TPU at 2^20, ancestors bit-identical except ~1e-6 float boundary ties).
Performance currently matches the XLA scatter+cummax path (~13 ms vs
~12 ms at 2^20 on v5e through the dev toolchain) — the per-chunk DMA
waits are not yet pipelined — so the XLA path remains the default in the
filters; this kernel is the foundation for the pipelined version.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(r_ref, cs_hbm, parts_hbm, anc_ref, out_ref,
            kbase_ref, cs_win, parts_win, sems, *, n, n_pad, b, w, nx):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        kbase_ref[0] = 0

    r = r_ref[0]
    slot = (
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0) + i * b
    ).astype(jnp.float32)
    u = (slot + r) / jnp.float32(n)  # (b, 1)
    u_max = jnp.max(u)

    def fetch(start):
        start = pl.multiple_of(start, w)
        c1 = pltpu.make_async_copy(
            cs_hbm.at[:, pl.ds(start, w)], cs_win, sems.at[0]
        )
        c2 = pltpu.make_async_copy(
            parts_hbm.at[:, pl.ds(start, w)], parts_win, sems.at[1]
        )
        c1.start()
        c2.start()
        c1.wait()
        c2.wait()

    def body(carry):
        start, counts, acc, finalized, _done = carry
        fetch(start)
        cs_row = cs_win[:]  # (1, w)
        lt = (cs_row < u).astype(jnp.int32)  # (b, w)
        c_in = jnp.sum(lt, axis=1, keepdims=True)  # (b, 1) relative count
        # one-hot of the ancestor column, only for slots whose ancestor
        # lies in THIS window and was not finalized by a previous window
        col = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
        # float32 0/1 masks throughout: Mosaic cannot carry i1 vectors
        # through scf.while yields
        open_mask = 1.0 - finalized  # (b, 1) slots still searching
        hits = (
            jnp.where(col == c_in, 1.0, 0.0)
            * jnp.where(c_in < w, 1.0, 0.0)
            * open_mask
        )
        # parts_win is stored transposed and sublane-padded (8, w) so the
        # HBM DMA slices the 128-aligned lane dim; contract over w directly
        acc = acc + jax.lax.dot_general(
            hits, parts_win[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # exact gather, no bf16 passes
        )
        counts = counts + c_in
        finalized = jnp.maximum(finalized, jnp.where(c_in < w, 1.0, 0.0))
        done = jnp.where(
            (cs_row[0, w - 1] >= u_max) | (start + w >= n_pad), 1, 0
        ).astype(jnp.int32)
        return start + w, counts, acc, finalized, done

    def cond(carry):
        return carry[4] == 0

    start0 = kbase_ref[0]
    counts0 = jnp.zeros((b, 1), jnp.int32) + start0  # entries before start0 all < u
    acc0 = jnp.zeros((b, 8), jnp.float32)
    finalized0 = jnp.zeros((b, 1), jnp.float32)
    _, counts, acc, _, _ = jax.lax.while_loop(
        cond, body, (start0, counts0, acc0, finalized0, jnp.asarray(0, jnp.int32))
    )

    ancestors = jnp.clip(counts, 0, n - 1)
    anc_ref[:] = ancestors
    out_ref[:] = acc[:, :nx]
    # next chunk resumes its scan at the window holding the last slot's
    # ancestor, rounded down to a window boundary so every DMA start stays
    # w-aligned (Mosaic requires provable 128-divisibility of slice starts)
    kbase_ref[0] = (ancestors[b - 1, 0] // w) * w


def pallas_systematic_resample(
    particles: jax.Array, weights: jax.Array, r: jax.Array,
    block_slots: int = 512, window: int = 512, interpret: bool = False,
):
    """Fused systematic resample: returns (resampled_particles, ancestors).

    Same semantics as
    :func:`gpu_se_tpu.filters.resampling.systematic_resample_indices`
    followed by a row gather.
    """
    n, nx = particles.shape
    b, w = block_slots, window
    assert n % b == 0, "particle count must be a multiple of block_slots"
    # B=2048/W=256 deadlocks on real TPU (wedges the relay for ~5 min,
    # see CLAUDE.md); only small-B geometries are device-validated.
    assert b < 2048, f"block_slots={b} is a known-deadlock geometry on TPU"

    cs = jnp.cumsum(weights.astype(jnp.float32))
    cs = cs / cs[-1]
    # the TPU tree cumsum dips by an ulp locally; the kernel's window-count
    # invariants (counts never decrease across windows) need monotone cs,
    # and monotonizing makes all formulations agree bitwise (cf.
    # filters/resampling.py). cummax is ~free on TPU.
    cs = jax.lax.cummax(cs)
    n_pad = ((n + w - 1) // w) * w + w
    cs_padded = jnp.concatenate([cs, jnp.full((n_pad - n,), 2.0, cs.dtype)])
    cs_padded = cs_padded.reshape(1, n_pad)
    # (8, n_pad): transposed so the manual DMA slices the 128-aligned lane
    # dim, and sublane-padded to the (8, 128) float32 tile
    parts_padded = jnp.zeros((8, n_pad), jnp.float32)
    parts_padded = parts_padded.at[:nx, :n].set(particles.astype(jnp.float32).T)

    kernel = functools.partial(_kernel, n=n, n_pad=n_pad, b=b, w=w, nx=nx)
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
            pltpu.SMEM((1,), jnp.int32),  # carry: window start
            pltpu.VMEM((1, w), jnp.float32),  # cumsum window
            pltpu.VMEM((8, w), jnp.float32),  # particle window (transposed, padded)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(r, jnp.float32).reshape(1), cs_padded, parts_padded)
    return out, anc[:, 0]
