"""Multi-chip particle filtering: GSPMD auto-sharding + explicit shard_map.

Two complementary paths over a 1-D ``Mesh('particles')``:

* :func:`auto_sharded_step` — the *same* functional PF step jitted with
  ``NamedSharding`` constraints. XLA partitions the vmapped f/g
  elementwise work, psums the weight reductions, and all-gathers for the
  resampling gather. With ``jax_threefry_partitionable`` the noise draws
  are bitwise identical to the single-device run, so shard-invariance is
  exact — this is the correctness anchor.

* :func:`shard_map_step` — explicit SPMD: per-shard predict/update, then
  distributed systematic resampling with O(n_local) per-shard memory:
  a fixed-128-slot segmented cumsum (bitwise width-invariant numerics;
  only the (n/128,) segment totals are ever replicated), ancestor
  computation and particle exchange via ppermute rings that rotate one
  shard-sized block at a time over ICI. This is the hand-scheduled
  analogue of the reference's CUDA pipeline (torch cumsum + Nicely
  kernel + gather, /root/reference/filter/particle.py:296-316), scaled
  to the >=2^24-particle regime the reference exercised
  (tests/ParallelParticleFilter_test.py:5). Noise is drawn *outside*
  the shard_map with partitionable keys so both paths see identical
  randomness.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gpu_se_tpu.distributions.gaussian_sum import GaussianSum
from gpu_se_tpu.filters.particle import PFState
from gpu_se_tpu.filters.resampling import sorted_row_gather
from gpu_se_tpu.parallel.mesh import PARTICLE_AXIS


# ----------------------------------------------------------------------
# Path 1: GSPMD auto-sharding of the functional core
# ----------------------------------------------------------------------
def shard_pf_state(state: PFState, mesh: Mesh) -> PFState:
    """Place a PFState with particles/weights sharded over the mesh."""
    psh = NamedSharding(mesh, P(PARTICLE_AXIS))
    rsh = NamedSharding(mesh, P())
    return PFState(
        particles=jax.device_put(state.particles, NamedSharding(mesh, P(PARTICLE_AXIS, None))),
        weights=jax.device_put(state.weights, psh),
        key=jax.device_put(state.key, rsh),
    )


def make_auto_sharded_step(mesh: Mesh, f: Callable, g: Callable):
    """Jit the fused PF step with sharding constraints; XLA inserts the
    collectives (psum for moments, all-gather for the resample gather)."""
    from gpu_se_tpu.filters import particle as pf_core

    p_sh = NamedSharding(mesh, P(PARTICLE_AXIS, None))
    w_sh = NamedSharding(mesh, P(PARTICLE_AXIS))
    r_sh = NamedSharding(mesh, P())

    state_shardings = PFState(particles=p_sh, weights=w_sh, key=r_sh)

    @partial(
        jax.jit,
        in_shardings=(state_shardings, r_sh, r_sh, r_sh, None, None),
        out_shardings=state_shardings,
    )
    def step(state, u, z, dt, state_pdf, measurement_pdf):
        from gpu_se_tpu.filters import resampling

        # the Pallas resample custom call has no GSPMD partitioning rule;
        # the auto-sharded path must trace the XLA formulation
        with resampling.impl("xla"):
            return pf_core.step(state, u, z, dt, f, g, state_pdf, measurement_pdf)

    return step


# ----------------------------------------------------------------------
# Path 2: explicit shard_map SPMD
# ----------------------------------------------------------------------
def _local_predict(particles, u, dt, noise, f):
    deltas = jax.vmap(f, in_axes=(0, None, None))(particles, u, dt)
    return particles + deltas + noise


def _local_update(particles, weights, u, z, g, measurement_pdf):
    ys = jax.vmap(g, in_axes=(0, None))(particles, u)
    return weights * measurement_pdf.pdf(z - ys)


# Canonical segment length for the distributed cumsum. Any mesh width
# whose shard size is a multiple of this sees the SAME f32 summation
# grouping, so resample boundaries are bitwise width-invariant (the
# motivating failure: a width-dependent local-scan + f32-offset grouping
# shifted boundaries at 2^22 degenerate weights and moved the point
# estimate ~3% between widths 2 and 8).
_SEGMENT = 128


def _segmented_ends(weights, r, axis: str):
    """Distributed ``ends`` vector of the inverse systematic-resample
    formulation (cf. filters/resampling.py:52-59), with width-invariant
    numerics and O(n_local) memory.

    The weight cumsum is computed in fixed 128-slot segments: each shard
    scans its own segments locally, all-gathers only the (n/128,) segment
    totals, and rebuilds its slice of the global normalized cumsum as
    ``(inner + offset) / total`` — every f32 rounding is grouped
    identically for every mesh width (and exactly, since segment sums,
    their small cumsum, and the elementwise combine see the same operands
    in the same order regardless of where shard boundaries fall). The
    integer ``ends`` then needs only an exact cross-shard running max to
    finish the monotonization.
    """
    n_local = weights.shape[0]
    s_idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    n_global = n_local * n_shards

    seg = _SEGMENT if (n_local % _SEGMENT == 0) else n_local
    inner = jnp.cumsum(weights.reshape(-1, seg), axis=1)  # per-segment scan
    totals = jax.lax.all_gather(inner[:, -1], axis).reshape(-1)  # (n/seg,)
    co = jnp.cumsum(totals)  # tiny, replicated, identical on every shard
    off = jnp.concatenate([jnp.zeros((1,), co.dtype), co[:-1]])
    total = co[-1]
    nseg_local = n_local // seg
    off_local = jax.lax.dynamic_slice_in_dim(off, s_idx * nseg_local, nseg_local)
    cs = ((inner + off_local[:, None]) / total).reshape(n_local)

    ends = jnp.floor(n_global * cs - r).astype(jnp.int32)
    ends = jax.lax.cummax(ends)
    # cross-shard running max (exact integer ops): prev = max of earlier
    # shards' final ends
    lasts = jax.lax.all_gather(ends[-1], axis)  # (n_shards,)
    prev = jnp.max(
        jnp.where(jnp.arange(n_shards) < s_idx, lasts, jnp.int32(-1))
    )
    ends = jnp.maximum(ends, prev)
    return jnp.clip(ends, -1, n_global - 1), prev


def _ring_perm(n_shards: int):
    # send to the next shard => after k steps shard s holds block (s-k)%W
    return [(i, (i + 1) % n_shards) for i in range(n_shards)]


def _ring_ancestors(ends, prev_end, axis: str):
    """Global ancestor indices for this shard's output slots, from the
    distributed ``ends`` blocks, via a ppermute ring (O(n_local) memory).

    Round k processes source block q=(s-k)%W: particle ``kbase+j`` first
    feeds global slot ``ends[j-1]+1``; the ones landing in this shard's
    slot range are scattered as seeds and an inclusive running max fills
    the rest — the distributed form of the scatter+cummax inverse
    formulation (filters/resampling.py:60-70). The first slot's ancestor
    (whose seed may live on another shard) is recovered exactly as
    ``#{ends < first_slot}``, accumulated ring-wide.
    """
    n_local = ends.shape[0]
    s_idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    n_global = n_local * n_shards
    slot0 = s_idx * n_local
    perm = _ring_perm(n_shards)

    # boundary value feeding each block's first element: the previous
    # block's final (monotonized) ends — already computed exactly as
    # ``prev_end`` on the OWNER of each block, so circulate it alongside.
    seed = jnp.zeros((n_local,), jnp.int32)
    cnt0 = jnp.zeros((), jnp.int32)
    ks = jnp.arange(n_local, dtype=jnp.int32)

    def round_body(rnd, carry):
        carry_ends, carry_prev, seed, cnt0 = carry
        q = (s_idx - rnd) % n_shards
        kbase = q * n_local
        fs = jnp.concatenate([carry_prev[None], carry_ends[:-1]]) + 1
        valid = fs <= carry_ends  # particle parents >= 1 slot
        tgt = fs - slot0
        tgt = jnp.where(valid & (tgt >= 0) & (tgt < n_local), tgt, n_local)
        seed = seed.at[tgt].max(kbase + ks, mode="drop")
        cnt0 = cnt0 + jnp.sum((carry_ends < slot0).astype(jnp.int32))
        # one extra rotation on the final round returns the block to its
        # owner; a fori_loop (vs Python unrolling) keeps XLA's buffer
        # assignment at one live block instead of one per round
        carry_ends = jax.lax.ppermute(carry_ends, axis, perm)
        carry_prev = jax.lax.ppermute(carry_prev, axis, perm)
        return carry_ends, carry_prev, seed, cnt0

    _, _, seed, cnt0 = jax.lax.fori_loop(
        0, n_shards, round_body, (ends, prev_end, seed, cnt0)
    )
    seed = seed.at[0].max(cnt0)
    anc = jax.lax.cummax(seed)
    return jnp.clip(anc, 0, n_global - 1)


def _ring_gather(pytree, ancestors, axis: str):
    """Gather globally-indexed rows from the sharded pool via a ppermute
    ring: each round rotates one O(n_local) block through every shard and
    copies the rows whose (sorted) ancestors fall in that block — the
    segmented exchange SURVEY section 7 calls for, replacing the
    all-gather of the full pool (O(n_global) live bytes per shard)."""
    n_local = ancestors.shape[0]
    s_idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    perm = _ring_perm(n_shards)
    ancestors = jax.lax.optimization_barrier(ancestors)

    out0 = jax.tree_util.tree_map(
        lambda a: jnp.zeros((n_local,) + a.shape[1:], a.dtype), pytree
    )

    def round_body(rnd, carry):
        blocks, out = carry
        q = (s_idx - rnd) % n_shards
        lo = q * n_local
        in_blk = (ancestors >= lo) & (ancestors < lo + n_local)
        # clipped local indices stay monotone => sorted-gather lowering
        li = jnp.clip(ancestors - lo, 0, n_local - 1)

        def take_block(args):
            blocks_, out_ = args
            def leaf(c, o):
                g = sorted_row_gather(c, li)
                m = in_blk.reshape((-1,) + (1,) * (o.ndim - 1))
                return jnp.where(m, g, o)
            return jax.tree_util.tree_map(leaf, blocks_, out_)

        # data-dependent skip: no collectives inside, so a per-shard
        # divergent predicate is safe under shard_map
        out = jax.lax.cond(
            jnp.any(in_blk), take_block, lambda args: args[1], (blocks, out)
        )
        # rotate every round (the last rotation returns blocks home); the
        # fori_loop keeps one live visiting block instead of one per round
        blocks = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, axis, perm), blocks
        )
        return blocks, out

    _, out = jax.lax.fori_loop(0, n_shards, round_body, (pytree, out0))
    return out


def _distributed_systematic_resample_kernel(
    pytree, weights, r, axis: str, *,
    block_slots: int = 128, window: int = 256, interpret: bool = False,
):
    """Sharded systematic resample whose per-shard search+gather runs the
    fused Pallas block-merge kernel (ops/resample_pallas_block.py) — the
    composition of the single-chip kernel story with the multi-chip
    protocol (VERDICT round 2, task 3). PF-only (single (n_local, nx<=8)
    leaf); the GSUKF keeps the XLA ring.

    Identical semantics to :func:`_distributed_systematic_resample`: the
    kernel consumes the same width-invariant integer ``ends`` blocks, so
    ancestors and rows are bitwise-equal to the XLA ring by construction
    (integer compares, exact one-hot gather). Any pytree of (n_local,
    ...) rows packs into one (n_local, <=32) payload (the GSUKF bank =
    30 columns). Blocks are visited in
    ascending global order via a psum-masked broadcast (the merge is
    order-sensitive, unlike the ring's order-free scatter), with two
    data-dependent skips: a block wholly below this shard's slot range
    contributes only a count shift, and a shard whose slots are all
    finalized stops scanning entirely.
    """
    from gpu_se_tpu.ops.resample_pallas_block import (
        block_resample_state,
        pack_rows,
        pallas_block_resample_round,
        unpack_rows,
    )

    particles, meta = pack_rows(pytree)
    n_local, nx = particles.shape
    s_idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    n_global = n_local * n_shards
    slot0 = s_idx * n_local

    ends, _prev = _segmented_ends(weights, r, axis)
    counts, acc, fin = block_resample_state(n_local, nx)

    def round_body(q, carry):
        counts, acc, fin = carry
        mine = (s_idx == q).astype(jnp.int32)
        blk_ends = jax.lax.psum(ends * mine, axis)
        blk_parts = jax.lax.psum(
            particles * mine.astype(particles.dtype), axis
        )

        full_below = blk_ends[-1] < slot0
        all_done = jnp.all(fin > 0.5)

        def skip_below(c, a, f):
            return c + n_local, a, f

        def scan_block(c, a, f):
            return pallas_block_resample_round(
                blk_ends, blk_parts, slot0, c, a, f,
                block_slots=block_slots, window=window, interpret=interpret,
            )

        counts, acc, fin = jax.lax.cond(
            full_below,
            skip_below,
            lambda c, a, f: jax.lax.cond(
                all_done, lambda c, a, f: (c, a, f), scan_block, c, a, f
            ),
            counts, acc, fin,
        )
        return counts, acc, fin

    counts, acc, fin = jax.lax.fori_loop(
        0, n_shards, round_body, (counts, acc, fin)
    )
    new_tree = unpack_rows(acc[:, :nx], meta)
    new_weights = jnp.full((n_local,), 1.0 / n_global, dtype=weights.dtype)
    return new_tree, new_weights


# ----------------------------------------------------------------------
# Round-5 protocol: compact -> block-range exchange -> one local merge.
#
# The round-2/3 rings above move EVERY block through EVERY chip (O(W *
# n_local) ICI bytes and W sequential scatter rounds) — modeled at 19-29%
# strong-scaling efficiency (results/artifacts/SCALING_MODEL.json, round
# 4). This protocol exploits two structural facts of systematic
# resampling:
#
# 1. Only SURVIVORS (entries with ``ends[k] > ends[k-1]``) can be
#    ancestors, and their covered-slot intervals [first_k, last_k] =
#    [ends[k-1]+1, ends[k]] partition the global slot space.
# 2. A destination shard's n_local slots therefore intersect a set of
#    survivors that (a) numbers at most n_local (each covers >=1 of its
#    slots) and (b) forms one contiguous run per source shard.
#
# So the exchange is a RAGGED ALL-TO-ALL of contiguous survivor runs:
# O(n_local) received rows per chip, O(boundary) bytes on the wire in
# the non-adversarial regimes (survivors destined to their own shard
# never transit). After the exchange each shard holds a sorted compacted
# payload covering exactly its slot range and finishes with ONE local
# merge (seed scatter + cummax in XLA, or the v4 jumbo-window kernel —
# strictly increasing ends guarantee its <=128-span compacted-path
# invariant). Every stage is exact integer arithmetic on the
# width-invariant ``_segmented_ends`` output, so results are bitwise
# equal to the ring protocol and to the single-device step.
#
# ``lax.ragged_all_to_all`` has no XLA:CPU lowering, so the virtual-mesh
# tests run a ppermute-ring EMULATION of the same exchange that produces
# a bitwise-identical receive buffer (same runs, same offsets); the
# collective choice is a lowering detail, not a semantic one.
# ----------------------------------------------------------------------
_IBIG = jnp.int32(2**30)     # int pad: > any global slot index


def _compact_survivors(packed, ends, prev):
    """Shard-local survivor compaction.

    Returns ``(rows, ends, first)`` with survivors dense at the front in
    ends order (strictly increasing) and int pads of ``_IBIG`` beyond —
    the distributed analogue of the v4 compaction kernel's keep rule
    (ops/resample_pallas4.py)."""
    n_local = ends.shape[0]
    prev_ends = jnp.concatenate([prev[None], ends[:-1]])
    keep = ends > prev_ends
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    tgt = jnp.where(keep, pos, n_local)
    surv_rows = jnp.zeros_like(packed).at[tgt].set(packed, mode="drop")
    surv_ends = jnp.full((n_local,), _IBIG).at[tgt].set(ends, mode="drop")
    surv_first = jnp.full((n_local,), _IBIG).at[tgt].set(
        prev_ends + 1, mode="drop")
    return surv_rows, surv_ends, surv_first


def _send_windows(surv_ends, surv_first, n_local, n_shards):
    """Per-destination contiguous run [lo, lo+size) of local survivors
    whose slot interval intersects that destination's slot range.

    ``lo = #{last < range_start}`` drops survivors wholly before the
    range; ``hi = #{first < range_end}`` keeps those starting before its
    end. Both arrays are sorted (strict ends order; _IBIG pads), so each
    is one searchsorted."""
    starts = (jnp.arange(n_shards, dtype=jnp.int32) * n_local).astype(
        surv_ends.dtype)
    nl = jnp.asarray(n_local, surv_ends.dtype)
    lo = jnp.searchsorted(surv_ends, starts, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(surv_first, starts + nl,
                          side="left").astype(jnp.int32)
    return lo, hi - lo


def _exchange_ragged(surv_rows, surv_meta, in_off, send_sz, out_off,
                     recv_sz, axis: str):
    """The production exchange: one ragged all-to-all per buffer (rows
    f32, meta int32). Unwritten receive entries keep the init values, so
    the int pads double as the validity mask."""
    rows = jax.lax.ragged_all_to_all(
        surv_rows, jnp.zeros_like(surv_rows),
        in_off, send_sz, out_off, recv_sz, axis_name=axis)
    meta = jax.lax.ragged_all_to_all(
        surv_meta, jnp.full_like(surv_meta, _IBIG),
        in_off, send_sz, out_off, recv_sz, axis_name=axis)
    return rows, meta


def _exchange_ring(surv_rows, surv_meta, sizes_mat, off_mat, axis: str):
    """CPU-testable ppermute-ring emulation of :func:`_exchange_ragged`:
    rotates the survivor blocks and copies each visiting block's run for
    THIS shard to the same receive offsets the ragged collective would
    use — the receive buffers are bitwise identical."""
    n_local = surv_rows.shape[0]
    s_idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    perm = _ring_perm(n_shards)
    slot0 = s_idx * n_local

    my_sizes = sizes_mat[:, s_idx]          # (W,) run length by source
    my_offs = off_mat[:, s_idx]             # (W,) receive offset by source
    out_rows = jnp.zeros_like(surv_rows)
    out_meta = jnp.full_like(surv_meta, _IBIG)
    i = jnp.arange(n_local, dtype=jnp.int32)

    def round_body(rnd, carry):
        vis_rows, vis_meta, out_rows, out_meta = carry
        q = (s_idx - rnd) % n_shards
        lo = jnp.searchsorted(vis_meta[:, 0], slot0,
                              side="left").astype(jnp.int32)
        size = jnp.take(my_sizes, q)
        tgt = jnp.where((i >= lo) & (i < lo + size),
                        jnp.take(my_offs, q) + i - lo, n_local)
        out_rows = out_rows.at[tgt].set(vis_rows, mode="drop")
        out_meta = out_meta.at[tgt].set(vis_meta, mode="drop")
        vis_rows = jax.lax.ppermute(vis_rows, axis, perm)
        vis_meta = jax.lax.ppermute(vis_meta, axis, perm)
        return vis_rows, vis_meta, out_rows, out_meta

    _, _, out_rows, out_meta = jax.lax.fori_loop(
        0, n_shards, round_body, (surv_rows, surv_meta, out_rows, out_meta)
    )
    return out_rows, out_meta


def _merge_received_xla(recv_rows, recv_ends, recv_first, slot0, n_local):
    """One local merge: received survivor i seeds local slot
    ``first_i - slot0`` (the boundary survivor clips to 0 — it is the
    unique one with first < slot0), cummax fills coverage, one sorted
    row gather materializes the output — the per-shard form of the
    scatter+cummax inverse formulation (filters/resampling.py)."""
    valid = recv_ends < _IBIG
    j0 = jnp.clip(recv_first - slot0, 0, n_local - 1)
    tgt = jnp.where(valid, j0, n_local)
    seed = jnp.full((n_local,), jnp.int32(-1)).at[tgt].max(
        jnp.arange(n_local, dtype=jnp.int32), mode="drop")
    p = jax.lax.cummax(seed)
    return sorted_row_gather(recv_rows, jnp.clip(p, 0, n_local - 1))


def _compact_survivors_v4(particles, ends, prev, interpret: bool):
    """Shard-local survivor compaction through the v4 block-vectorized
    compaction kernel (ops/resample_pallas4.py) — no XLA scatter (the
    seed-scatter lowering costs ~7.8 ms at 2^20 on v5e; the kernel
    streams the tiled payload at ~0.9 ms).

    The kernel's keep rule initializes its running max at -1, so the
    global ends are shifted to local coordinates ``ends - (prev + 1)``
    first (an order-preserving shift: ``e_k > e_{k-1}`` and ``e_k > -1``
    iff the global relations hold) and shifted back after.

    Returns ``(surv_rows (n_local, nx) f32, surv_ends (n_local,) f32)``
    with survivors dense at the front and ``BIG`` pads beyond. Requires
    ``nx <= 5``, ``n_local % 4096 == 0``, global slots <= 2^24 (f32
    exactness)."""
    from gpu_se_tpu.ops import resample_pallas4 as v4

    n_local, nx = particles.shape
    t_data = n_local // v4.LANES
    shift = prev + 1
    ends_f = (ends - shift).astype(jnp.float32)

    p8 = jnp.zeros((8, t_data * v4.LANES), jnp.float32)
    p8 = p8.at[:nx].set(particles.T)
    p8 = p8.at[v4.ENDS_ROW].set(ends_f)
    tiled = (
        p8.reshape(8, t_data, v4.LANES)
        .transpose(1, 0, 2)
        .reshape(t_data, 8 * v4.LANES)
    )
    # 64 tiles/grid-step (round 5): ~0.4 ms less than 32 at 2^20 on
    # v5e; _compact clamps back to 32 when 64 doesn't divide t_data
    ctiled = v4._compact(tiled, n_local, 0, interpret, tiles_per_step=64)
    back = (
        ctiled.reshape(-1, 8, v4.LANES)
        .transpose(1, 0, 2)
        .reshape(8, -1)
    )
    surv_rows = back[:nx, :n_local].T
    c_ends = back[v4.ENDS_ROW, :n_local]
    surv_ends = jnp.where(
        c_ends < v4.BIG * 0.5, c_ends + shift.astype(jnp.float32), v4.BIG)
    return surv_rows, surv_ends


def _exchange_ring_f32(surv_buf, sizes_mat, off_mat, axis: str):
    """Ring emulation of the ragged exchange for the single packed f32
    buffer of the v4-compaction path (ends in the last column)."""
    n_local = surv_buf.shape[0]
    s_idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    perm = _ring_perm(n_shards)
    slot0_f = (s_idx * n_local).astype(jnp.float32)

    my_sizes = sizes_mat[:, s_idx]
    my_offs = off_mat[:, s_idx]
    init = jnp.zeros_like(surv_buf)
    from gpu_se_tpu.ops.resample_pallas4 import BIG
    init = init.at[:, -1].set(BIG)
    i = jnp.arange(n_local, dtype=jnp.int32)

    def round_body(rnd, carry):
        vis, out = carry
        q = (s_idx - rnd) % n_shards
        lo = jnp.searchsorted(vis[:, -1], slot0_f,
                              side="left").astype(jnp.int32)
        size = jnp.take(my_sizes, q)
        tgt = jnp.where((i >= lo) & (i < lo + size),
                        jnp.take(my_offs, q) + i - lo, n_local)
        out = out.at[tgt].set(vis, mode="drop")
        vis = jax.lax.ppermute(vis, axis, perm)
        return vis, out

    _, out = jax.lax.fori_loop(0, n_shards, round_body, (surv_buf, init))
    return out


def _merge_received_v4(recv_rows, recv_ends, slot0, n_local,
                       interpret: bool):
    """The same merge through the v4 jumbo-window kernel
    (ops/resample_pallas4.py): received ends are strictly increasing, so
    the compacted-path span bound (<=128 per tile) holds unconditionally.
    Requires nx <= 5 and n_local % 4096 == 0 (the PF regime)."""
    from gpu_se_tpu.ops import resample_pallas4 as v4

    nx = recv_rows.shape[1]
    tpb = 4096 // v4.LANES
    wt = 3 * tpb + 8
    t_data = n_local // v4.LANES
    t_alloc = t_data + wt
    nblocks = n_local // 4096

    if jnp.issubdtype(recv_ends.dtype, jnp.floating):
        valid = recv_ends < v4.BIG * 0.5
        shifted = recv_ends - slot0.astype(jnp.float32)
    else:
        valid = recv_ends < _IBIG
        shifted = (recv_ends - slot0).astype(jnp.float32)
    # local coords; one survivor at most extends past the range — clip
    # keeps compares for every local slot < n_local unchanged
    ends_f = jnp.where(valid, jnp.minimum(shifted, float(n_local)), v4.BIG)

    p8 = jnp.zeros((8, t_alloc * v4.LANES), jnp.float32)
    p8 = p8.at[:nx, :n_local].set(recv_rows.T)
    p8 = p8.at[v4.ENDS_ROW].set(jnp.concatenate([
        ends_f, jnp.full((t_alloc * v4.LANES - n_local,), v4.BIG)]))
    tiled = (
        p8.reshape(8, t_alloc, v4.LANES)
        .transpose(1, 0, 2)
        .reshape(t_alloc, 8 * v4.LANES)
    )
    qs = jnp.arange(nblocks + 1, dtype=jnp.int32)[:, None] * 4096
    p_blk = jnp.sum(
        (ends_f[::4096][None, :] < qs.astype(jnp.float32)).astype(jnp.int32),
        axis=1)
    base = jnp.clip((p_blk[:-1] - 1) * tpb, 0, t_alloc - wt).astype(jnp.int32)
    out_tiled = v4._run_main_kernel(tiled, base, n_local, tpb, wt, interpret)
    back = (
        out_tiled.reshape(t_data, 8, v4.LANES)
        .transpose(1, 0, 2)
        .reshape(8, n_local)
    )
    return back[:nx].T


# ----------------------------------------------------------------------
# Production PF pipeline: everything stays in the v4 (T, 1024) tiled
# layout end to end — compaction kernel output IS the exchange operand
# IS the merge kernel input.
#
# Why tiles: XLA's TPU RaggedAllToAll costs ~6 ns per operand ROW
# independent of row width (measured, scripts/probe_a2a_anchors.out), so
# exchanging (n_local, 6) survivor rows costs ~6 ms at 2^20 while the
# same bytes as (n_local/128, 1024) tile rows cost ~0.05 ms. Runs are
# tile-rounded; the pad lanes this drags along have their ends rewritten
# at the SENDER to duplicate the previous real end, which keeps the
# received ends sequence sorted, and a duplicate can never be the first
# entry >= a slot (its real twin precedes it), so the positional merge
# is unaffected. Duplicates can inflate a 128-slot window's entry count
# past the merge kernel's 384-entry reach only when several sources'
# tail tiles cluster in one window — a cheap span guard falls back to a
# shard-local XLA merge for that rare case (no collectives in either
# branch, so the divergent cond is safe under shard_map).
# ----------------------------------------------------------------------
def _a2a_tiled_ring(ctiled, in_off, sizes_t, off_t, t_recv, axis: str):
    """ppermute emulation of the tile-granular ragged exchange (CPU
    path): rotates the tiled blocks and each source's (W,) in_off row,
    producing the bitwise-identical receive buffer."""
    from gpu_se_tpu.ops.resample_pallas4 import BIG, ENDS_ROW, LANES

    s_idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    perm = _ring_perm(n_shards)

    my_sizes = sizes_t[:, s_idx]
    my_offs = off_t[:, s_idx]
    init = jnp.zeros((t_recv, 8 * LANES), jnp.float32)
    init = init.at[:, ENDS_ROW * LANES:(ENDS_ROW + 1) * LANES].set(BIG)
    rows = jnp.arange(ctiled.shape[0], dtype=jnp.int32)

    def round_body(rnd, carry):
        vis, vis_inoff, out = carry
        q = (s_idx - rnd) % n_shards
        size = jnp.take(my_sizes, q)
        lo = jnp.take(vis_inoff, s_idx)
        tgt = jnp.where((rows >= lo) & (rows < lo + size),
                        jnp.take(my_offs, q) + rows - lo, t_recv)
        out = out.at[tgt].set(vis, mode="drop")
        vis = jax.lax.ppermute(vis, axis, perm)
        vis_inoff = jax.lax.ppermute(vis_inoff, axis, perm)
        return vis, vis_inoff, out

    _, _, out = jax.lax.fori_loop(
        0, n_shards, round_body, (ctiled, in_off, init))
    return out


def _merge_received_v4_tiled(recv, slot0, n_local, nx, interpret: bool,
                             return_tiled: bool = False):
    """v4 merge directly on the received tiled buffer.

    ``recv`` is (t_recv, 1024) with a globally sorted (duplicates
    allowed) ends row in GLOBAL coordinates and BIG pads at the tail.
    Localizes ends in place, brackets window bases from a per-tile
    sample, guards the duplicate-inflation span bound, and runs the v4
    main kernel — falling back to a shard-local XLA scatter+cummax merge
    when a window would exceed the kernel's 384-entry reach."""
    from gpu_se_tpu.ops import resample_pallas4 as v4

    LANES = v4.LANES
    tpb = 4096 // LANES
    wt = 3 * tpb + 8
    t_recv = recv.shape[0]
    t_data = n_local // LANES
    nblocks = n_local // 4096

    sl = slice(v4.ENDS_ROW * LANES, (v4.ENDS_ROW + 1) * LANES)
    re = recv[:, sl].reshape(-1)
    valid = re < v4.BIG * 0.5
    el = jnp.where(
        valid,
        jnp.minimum(re - slot0.astype(jnp.float32), float(n_local)),
        v4.BIG)
    recv = recv.at[:, sl].set(el.reshape(t_recv, LANES))
    # pad the window overhang
    pad = jnp.zeros((wt, 8 * LANES), jnp.float32)
    pad = pad.at[:, sl].set(v4.BIG)
    tiled = jnp.concatenate([recv, pad])

    # window bases from the per-4096-block sample of the ends sequence
    qs = jnp.arange(nblocks + 1, dtype=jnp.int32)[:, None] * 4096
    sample = el[::4096]
    p_blk = jnp.sum(
        (sample[None, :] < qs.astype(jnp.float32)).astype(jnp.int32), axis=1)
    base = jnp.clip((p_blk[:-1] - 1) * tpb, 0,
                    tiled.shape[0] - wt).astype(jnp.int32)

    # span guard: entries per 128-slot window (duplicates included)
    thr = (jnp.arange(t_data + 1, dtype=jnp.int32) * LANES).astype(
        jnp.float32)
    cnt = jnp.searchsorted(el, thr, side="left")
    span_max = jnp.max(cnt[1:] - cnt[:-1])

    def kernel_merge(tiled):
        out_tiled = v4._run_main_kernel(
            tiled, base, n_local, tpb, wt, interpret)
        if return_tiled:
            # the round-5 tiled-state distributed step chains this
            # output directly into the next step's input
            return out_tiled
        back = (
            out_tiled.reshape(t_data, 8, LANES)
            .transpose(1, 0, 2)
            .reshape(8, n_local)
        )
        return back[:nx].T

    def xla_merge(tiled):
        n_tot = t_recv * LANES
        elv = el
        # derived local firsts; duplicates get first > last and never seed
        firsts = jnp.concatenate([jnp.full((1,), -1.0), elv[:-1] + 1.0])
        ok = (elv < v4.BIG * 0.5) & (firsts <= elv) & (firsts < n_local)
        j0 = jnp.clip(firsts, 0.0, float(n_local - 1)).astype(jnp.int32)
        tgt = jnp.where(ok, j0, n_local)
        seed = jnp.full((n_local,), jnp.int32(-1)).at[tgt].max(
            jnp.arange(n_tot, dtype=jnp.int32), mode="drop")
        # entry 0 covers slot 0 unless a later seed claims it
        seed = seed.at[0].max(jnp.where(elv[0] < v4.BIG * 0.5, 0, -1))
        p = jnp.clip(jax.lax.cummax(seed), 0, n_tot - 1)
        back = (
            recv.reshape(t_recv, 8, LANES)
            .transpose(1, 0, 2)
            .reshape(8, n_tot)
        )
        rows = back[:nx].T
        out = sorted_row_gather(rows, p)
        if not return_tiled:
            return out
        p8 = jnp.zeros((8, n_local), jnp.float32).at[:nx].set(out.T)
        return (
            p8.reshape(8, t_data, LANES)
            .transpose(1, 0, 2)
            .reshape(t_data, 8 * LANES)
        )

    return jax.lax.cond(span_max > 2 * LANES, xla_merge, kernel_merge, tiled)


def _distributed_systematic_resample_a2a_tiled(
    particles, weights, r, axis: str, *,
    exchange: str = "ragged", interpret: bool = False,
):
    """The production PF distributed resample: segmented ends -> v4
    compaction kernel (shifted local coords) -> tile-granular exchange
    (ragged all-to-all on TPU, ppermute emulation on CPU) -> v4 merge on
    the received tiles. Bitwise-equal to every other impl. Requires
    (n_local, nx<=5) f32, n_local % 4096 == 0, n_global <= 2^24."""
    from gpu_se_tpu.ops import resample_pallas4 as v4

    LANES = v4.LANES
    n_local, nx = particles.shape
    s_idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    n_global = n_local * n_shards
    slot0 = s_idx * n_local
    t_data = n_local // LANES

    ends, prev = _segmented_ends(weights, r, axis)
    shift = prev + 1
    ends_loc = (ends - shift).astype(jnp.float32)

    # tiled payload -> compaction kernel (local coords, keep init -1)
    p8 = jnp.zeros((8, t_data * LANES), jnp.float32)
    p8 = p8.at[:nx].set(particles.T)
    p8 = p8.at[v4.ENDS_ROW].set(ends_loc)
    tiled = (
        p8.reshape(8, t_data, LANES)
        .transpose(1, 0, 2)
        .reshape(t_data, 8 * LANES)
    )
    new_parts = _a2a_compact_exchange_merge(
        tiled, prev, n_local, nx, axis,
        exchange=exchange, interpret=interpret)
    new_weights = jnp.full((n_local,), 1.0 / n_global, dtype=weights.dtype)
    return new_parts, new_weights


def _a2a_compact_exchange_merge(
    tiled, prev, n_local, nx, axis: str, *,
    exchange: str = "ragged", interpret: bool = False,
    return_tiled: bool = False,
):
    """The round-5 pipeline from a LOCAL-coords tiled payload on:
    v4 compaction kernel -> global-coords pad rewrite -> tile-granular
    exchange -> v4 merge. ``tiled`` is (t_data, 1024) with the shard's
    ends in LOCAL coordinates (``ends - (prev+1)``) in the ENDS row.
    With ``return_tiled`` the merge output stays in the tiled layout —
    the tiled-state distributed step (make_shard_map_tiled_step) chains
    it directly."""
    from gpu_se_tpu.ops import resample_pallas4 as v4

    LANES = v4.LANES
    s_idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    slot0 = s_idx * n_local
    t_data = n_local // LANES
    shift = prev + 1
    # 64 tiles/grid-step (round 5): ~0.4 ms less than 32 at 2^20 on
    # v5e; _compact clamps back to 32 when 64 doesn't divide t_data
    ctiled = v4._compact(tiled, n_local, 0, interpret, tiles_per_step=64)
    t_out = ctiled.shape[0]

    # global-coords ends + duplicate-of-previous pad rewrite, in place
    sl = slice(v4.ENDS_ROW * LANES, (v4.ENDS_ROW + 1) * LANES)
    ce = ctiled[:, sl].reshape(-1)
    real = ce < v4.BIG * 0.5
    eg = jax.lax.cummax(
        jnp.where(real, ce + shift.astype(jnp.float32), -v4.BIG))
    ctiled = ctiled.at[:, sl].set(eg.reshape(t_out, LANES))

    # real-granularity run windows (BIG-padded views exclude dups/pads)
    er = jnp.where(real, eg, v4.BIG)
    fr = jnp.where(
        real,
        jnp.concatenate([
            (prev + 1).astype(jnp.float32)[None], er[:-1] + 1.0]),
        v4.BIG)
    starts = (jnp.arange(n_shards, dtype=jnp.int32) * n_local).astype(
        jnp.float32)
    lo_r = jnp.searchsorted(er, starts, side="left").astype(jnp.int32)
    hi_r = jnp.searchsorted(fr, starts + float(n_local),
                            side="left").astype(jnp.int32)
    tlo = lo_r // LANES
    thi = jnp.where(hi_r > lo_r, (hi_r + LANES - 1) // LANES, tlo)
    sizes = thi - tlo                                   # tiles per dest

    sizes_mat = jax.lax.all_gather(sizes, axis)         # (W, W) [src, dst]
    csum = jnp.cumsum(sizes_mat, axis=0)
    off_mat = csum - sizes_mat
    slack = ((2 * n_shards + 15) // 8) * 8
    t_recv = t_data + slack

    if exchange == "ragged":
        init = jnp.zeros((t_recv, 8 * LANES), jnp.float32)
        init = init.at[:, sl].set(v4.BIG)
        recv = jax.lax.ragged_all_to_all(
            ctiled, init, tlo, sizes,
            off_mat[s_idx], sizes_mat[:, s_idx], axis_name=axis)
    else:
        recv = _a2a_tiled_ring(
            ctiled, tlo, sizes_mat, off_mat, t_recv, axis)

    return _merge_received_v4_tiled(
        recv, slot0, n_local, nx, interpret, return_tiled=return_tiled)


def _distributed_systematic_resample_a2a(
    pytree, weights, r, axis: str, *,
    exchange: str = "ragged", merge: str = "xla", compact: str = "xla",
    interpret: bool = False,
):
    """Compact -> block-range exchange -> one local merge (see the
    section comment above). Bitwise-equal to
    :func:`_distributed_systematic_resample` for any weights.

    ``exchange``: "ragged" (lax.ragged_all_to_all; TPU) or "ring"
    (ppermute emulation; any backend). ``merge``: "xla" or "v4"
    (single-leaf nx<=5 payload, n_local % 4096 == 0). ``compact``:
    "xla" (scatter) or "v4" (the v4 compaction kernel — scatter-free;
    implies merge="v4" and the same shape gate plus n_global <= 2^24
    for f32 ends exactness)."""
    from gpu_se_tpu.ops.resample_pallas_block import pack_rows, unpack_rows

    packed, meta = pack_rows(pytree)
    n_local = weights.shape[0]
    s_idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    n_global = n_local * n_shards
    slot0 = s_idx * n_local

    ends, prev = _segmented_ends(weights, r, axis)

    if compact == "v4":
        # scatter-free kernel pipeline: f32 ends ride as the last column
        # of ONE exchanged buffer; firsts are derived (consecutive
        # survivors), not exchanged
        assert merge == "v4", "compact='v4' implies merge='v4'"
        surv_rows, surv_ends = _compact_survivors_v4(
            packed, ends, prev, interpret)
        from gpu_se_tpu.ops.resample_pallas4 import BIG

        # derived firsts are only real where the entry ITSELF is real:
        # the first pad would otherwise inherit last_end + 1 from the
        # final survivor and get sent as a phantom row (likewise first_0
        # on a zero-survivor shard)
        surv_first = jnp.where(
            surv_ends < BIG * 0.5,
            jnp.concatenate([
                (prev + 1).astype(jnp.float32)[None], surv_ends[:-1] + 1.0]),
            BIG)
        in_off, send_sz = _send_windows(
            surv_ends, surv_first, n_local, n_shards)
        sizes_mat = jax.lax.all_gather(send_sz, axis)
        csum = jnp.cumsum(sizes_mat, axis=0)
        off_mat = csum - sizes_mat
        surv_buf = jnp.concatenate([surv_rows, surv_ends[:, None]], axis=1)
        if exchange == "ragged":
            # the XLA RaggedAllToAll lowering costs ~5 ns/ROW on v5e
            # (measured ~5.2 ms for a full 2^20-row self-send,
            # scripts/probe_a2a_anchors.out) — so only CROSS-shard runs
            # ride the collective; the self run (the bulk in benign
            # regimes, all of it at W=1) is placed by one local shifted
            # copy at the same receive offset the collective would use
            sz_cross = send_sz.at[s_idx].set(0)
            recv_cross = jax.lax.ragged_all_to_all(
                surv_buf, jnp.zeros_like(surv_buf).at[:, -1].set(BIG),
                in_off, sz_cross,
                off_mat[s_idx], sizes_mat[:, s_idx].at[s_idx].set(0),
                axis_name=axis)
            off_self = off_mat[s_idx, s_idx]
            lo_self = in_off[s_idx]
            size_self = send_sz[s_idx]
            cols = surv_buf.shape[1]
            padded = jnp.concatenate([
                jnp.zeros_like(surv_buf), surv_buf,
                jnp.zeros_like(surv_buf)])
            shifted = jax.lax.dynamic_slice(
                padded, (n_local + lo_self - off_self, 0), (n_local, cols))
            pos = jnp.arange(n_local, dtype=jnp.int32)
            own = (pos >= off_self) & (pos < off_self + size_self)
            recv = jnp.where(own[:, None], shifted, recv_cross)
        else:
            recv = _exchange_ring_f32(surv_buf, sizes_mat, off_mat, axis)
        new_packed = _merge_received_v4(
            recv[:, :-1], recv[:, -1], slot0, n_local, interpret)
        new_tree = unpack_rows(new_packed, meta)
        new_weights = jnp.full(
            (n_local,), 1.0 / n_global, dtype=weights.dtype)
        return new_tree, new_weights

    surv_rows, surv_ends, surv_first = _compact_survivors(packed, ends, prev)
    in_off, send_sz = _send_windows(surv_ends, surv_first, n_local, n_shards)

    sizes_mat = jax.lax.all_gather(send_sz, axis)       # (W, W) [src, dst]
    csum = jnp.cumsum(sizes_mat, axis=0)
    off_mat = csum - sizes_mat                          # exclusive by src
    surv_meta = jnp.stack([surv_ends, surv_first], axis=1)

    if exchange == "ragged":
        out_off = off_mat[s_idx]
        recv_sz = sizes_mat[:, s_idx]
        recv_rows, recv_meta = _exchange_ragged(
            surv_rows, surv_meta, in_off, send_sz, out_off, recv_sz, axis)
    else:
        recv_rows, recv_meta = _exchange_ring(
            surv_rows, surv_meta, sizes_mat, off_mat, axis)

    if merge == "v4":
        new_packed = _merge_received_v4(
            recv_rows, recv_meta[:, 0], slot0, n_local, interpret)
    else:
        new_packed = _merge_received_xla(
            recv_rows, recv_meta[:, 0], recv_meta[:, 1], slot0, n_local)
    new_tree = unpack_rows(new_packed, meta)
    new_weights = jnp.full((n_local,), 1.0 / n_global, dtype=weights.dtype)
    return new_tree, new_weights


def _distributed_systematic_resample(pytree, weights, r, axis: str):
    """Systematic resample across shards of any pytree of (n_local, ...)
    arrays (particles for the PF; (means, covariances) for the GSUKF —
    the analogue of /root/reference/filter/gs_ukf.py:409-436).

    Memory-scalable: per-shard live bytes stay O(n_global / n_shards).
    The only O(n_global) objects ever resident are the (n/128,) segment
    totals. Three stages, all exact int32 after the segmented cumsum:

    1. :func:`_segmented_ends` — width-invariant distributed cumsum ->
       integer ``ends`` (small all-gathers only);
    2. :func:`_ring_ancestors` — ancestor indices via a ppermute ring
       over the ``ends`` blocks;
    3. :func:`_ring_gather` — particle exchange via a ppermute ring over
       the particle blocks (each shard keeps one visiting block live).

    Bitwise width-invariance holds whenever every width's shard size is a
    multiple of 128 (pinned at 2^23/2^24 in tests/test_sharding.py).
    """
    n_local = weights.shape[0]
    n_shards = jax.lax.axis_size(axis)
    n_global = n_local * n_shards

    ends, prev_end = _segmented_ends(weights, r, axis)
    ancestors = _ring_ancestors(ends, prev_end, axis)
    new_tree = _ring_gather(pytree, ancestors, axis)
    new_weights = jnp.full((n_local,), 1.0 / n_global, dtype=weights.dtype)
    return new_tree, new_weights


def make_shard_map_step(mesh: Mesh, f: Callable, g: Callable,
                        axis: str = PARTICLE_AXIS,
                        resample_impl: str = "xla"):
    """Fused sharded PF step with hand-written collectives.

    Noise/uniform draws happen outside the shard_map with partitionable
    keys, so results are bitwise identical to the single-device step
    whenever XLA keeps the elementwise math in the same order.

    ``resample_impl``: "xla" (scatter+ring, any pytree), "kernel" (fused
    Pallas block-merge per shard, real TPU), "kernel_interpret" (same
    kernel via the Pallas interpreter — the CPU-mesh test path), or the
    round-5 compact/exchange/merge protocol: "a2a" (ragged all-to-all +
    v4 merge kernel, real TPU production), "a2a_xla" (ragged + XLA
    merge), "a2a_ring" (ppermute-emulated exchange + XLA merge, any
    backend), "a2a_ring_v4" (emulated exchange + v4 merge via the
    interpreter — the CPU-mesh full-path test). All are bitwise-equal
    (integer ``ends`` merge domain).
    """
    _A2A = {  # survivor-granularity variants: (exchange, merge, compact, interp)
        "a2a_xla": ("ragged", "xla", "xla", False),
        "a2a_ring": ("ring", "xla", "xla", False),
        "a2a_ring_v4": ("ring", "v4", "v4", True),
    }
    _A2A_TILED = {  # tile-granularity production pipeline: (exchange, interp)
        "a2a": ("ragged", False),
        "a2a_tiled_ring": ("ring", True),
    }

    def step(state: PFState, u, z, dt, state_pdf: GaussianSum,
             measurement_pdf: GaussianSum) -> PFState:
        n = state.particles.shape[0]
        key, k_noise, k_r = jax.random.split(state.key, 3)
        noise = state_pdf.draw(k_noise, (n,))
        r = jax.random.uniform(k_r, ())

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(axis, None), P(axis), P(), P(), P(), P(axis, None), P(),
            ),
            out_specs=(P(axis, None), P(axis)),
            check_vma=False,
        )
        def sharded(particles, weights, u, z, dt, noise, r):
            particles = _local_predict(particles, u, dt, noise, f)
            weights = _local_update(particles, weights, u, z, g, measurement_pdf)
            if resample_impl == "xla":
                particles, weights = _distributed_systematic_resample(
                    particles, weights, r, axis
                )
            elif resample_impl in _A2A_TILED:
                exch, interp = _A2A_TILED[resample_impl]
                particles, weights = (
                    _distributed_systematic_resample_a2a_tiled(
                        particles, weights, r, axis,
                        exchange=exch, interpret=interp,
                    ))
            elif resample_impl in _A2A:
                exch, merge, comp, interp = _A2A[resample_impl]
                particles, weights = _distributed_systematic_resample_a2a(
                    particles, weights, r, axis,
                    exchange=exch, merge=merge, compact=comp,
                    interpret=interp,
                )
            else:
                particles, weights = _distributed_systematic_resample_kernel(
                    particles, weights, r, axis,
                    interpret=(resample_impl == "kernel_interpret"),
                )
            return particles, weights

        particles, weights = sharded(
            state.particles, state.weights, u, z,
            jnp.asarray(dt, state.particles.dtype), noise, r,
        )
        return PFState(particles=particles, weights=weights, key=key)

    p_sh = NamedSharding(mesh, P(axis, None))
    w_sh = NamedSharding(mesh, P(axis))
    r_sh = NamedSharding(mesh, P())
    state_shardings = PFState(particles=p_sh, weights=w_sh, key=r_sh)
    return jax.jit(
        step,
        in_shardings=(state_shardings, r_sh, r_sh, None, None, None),
        out_shardings=state_shardings,
    )


# ----------------------------------------------------------------------
# GSUKF sharding: the same particle-axis story over the Gaussian bank
# ----------------------------------------------------------------------
def shard_gsukf_state(state, mesh: Mesh):
    """Place a GSUKFState with the bank axis sharded over the mesh."""
    from gpu_se_tpu.filters.gs_ukf import GSUKFState

    return GSUKFState(
        means=jax.device_put(state.means, NamedSharding(mesh, P(PARTICLE_AXIS, None))),
        covariances=jax.device_put(
            state.covariances, NamedSharding(mesh, P(PARTICLE_AXIS, None, None))
        ),
        weights=jax.device_put(state.weights, NamedSharding(mesh, P(PARTICLE_AXIS))),
        key=jax.device_put(state.key, NamedSharding(mesh, P())),
    )


def make_auto_sharded_gsukf_step(mesh: Mesh, f: Callable, g: Callable):
    """GSPMD-sharded fused GSUKF step (bank axis data-parallel): the
    batched Cholesky/UKF math partitions elementwise over the bank; the
    weight reductions and the resampling gather become psum/all-gather."""
    from gpu_se_tpu.filters import gs_ukf
    from gpu_se_tpu.filters.gs_ukf import GSUKFState

    m_sh = NamedSharding(mesh, P(PARTICLE_AXIS, None))
    c_sh = NamedSharding(mesh, P(PARTICLE_AXIS, None, None))
    w_sh = NamedSharding(mesh, P(PARTICLE_AXIS))
    r_sh = NamedSharding(mesh, P())
    state_sh = GSUKFState(means=m_sh, covariances=c_sh, weights=w_sh, key=r_sh)

    @partial(
        jax.jit,
        in_shardings=(state_sh, r_sh, r_sh, r_sh, None, None),
        out_shardings=state_sh,
    )
    def step(state, u, z, dt, state_pdf, measurement_pdf):
        from gpu_se_tpu.filters import resampling

        with resampling.impl("xla"):
            return gs_ukf.step(state, u, z, dt, f, g, state_pdf, measurement_pdf)

    return step


def make_shard_map_gsukf_step(mesh: Mesh, f: Callable, g: Callable,
                              axis: str = PARTICLE_AXIS,
                              resample_impl: str = "xla"):
    """Explicit shard_map GSUKF step: per-shard sigma-point predict/update
    (gs_ukf.predict_core/update_core) + distributed systematic resample of
    the (means, covariances) bank — the hand-scheduled analogue of the
    reference's GPU resample of both arrays
    (/root/reference/filter/gs_ukf.py:409-436). Sigma-point noise is drawn
    outside the shard_map with partitionable keys, so the result matches
    the single-device step under the identical key schedule."""
    from gpu_se_tpu.filters import gs_ukf
    from gpu_se_tpu.filters.gs_ukf import GSUKFState

    def step(state: GSUKFState, u, z, dt, state_pdf: GaussianSum,
             measurement_pdf: GaussianSum) -> GSUKFState:
        n, nx = state.means.shape
        key, k_noise, k_r = jax.random.split(state.key, 3)
        noise = state_pdf.draw(k_noise, (n, 2 * nx + 1))
        r = jax.random.uniform(k_r, ())

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(axis, None), P(axis, None, None), P(axis),
                P(), P(), P(), P(axis, None, None), P(),
            ),
            out_specs=(P(axis, None), P(axis, None, None), P(axis)),
            check_vma=False,
        )
        def sharded(means, covs, weights, u, z, dt, noise, r):
            means, covs = gs_ukf.predict_core(means, covs, u, dt, noise, f)
            means, covs, weights = gs_ukf.update_core(
                means, covs, weights, u, z, g, measurement_pdf
            )
            if resample_impl == "xla":
                (means, covs), weights = _distributed_systematic_resample(
                    (means, covs), weights, r, axis
                )
            elif resample_impl in ("a2a", "a2a_ring"):
                # multi-leaf bank packs to 30 cols > the v4 kernel's 5,
                # so the a2a protocol merges in XLA here
                (means, covs), weights = _distributed_systematic_resample_a2a(
                    (means, covs), weights, r, axis,
                    exchange=("ragged" if resample_impl == "a2a" else "ring"),
                    merge="xla",
                )
            else:
                (means, covs), weights = _distributed_systematic_resample_kernel(
                    (means, covs), weights, r, axis,
                    interpret=(resample_impl == "kernel_interpret"),
                )
            return means, covs, weights

        means, covs, weights = sharded(
            state.means, state.covariances, state.weights, u, z,
            jnp.asarray(dt, state.means.dtype), noise, r,
        )
        return GSUKFState(means=means, covariances=covs, weights=weights, key=key)

    m_sh = NamedSharding(mesh, P(axis, None))
    c_sh = NamedSharding(mesh, P(axis, None, None))
    w_sh = NamedSharding(mesh, P(axis))
    r_sh = NamedSharding(mesh, P())
    state_shardings = GSUKFState(means=m_sh, covariances=c_sh, weights=w_sh, key=r_sh)
    return jax.jit(
        step,
        in_shardings=(state_shardings, r_sh, r_sh, None, None, None),
        out_shardings=state_shardings,
    )


def shard_tiled_pf_state(state, mesh: Mesh):
    """Place a TiledPFState on the mesh: tile rows sharded over the
    particle axis (each shard holds n_local/128 contiguous tile rows —
    exactly the per-shard tiled payload), key replicated."""
    from gpu_se_tpu.filters.particle_tiled import TiledPFState

    return TiledPFState(
        tiled=jax.device_put(
            state.tiled, NamedSharding(mesh, P(PARTICLE_AXIS, None))),
        key=jax.device_put(state.key, NamedSharding(mesh, P())),
    )


def make_shard_map_tiled_step(mesh: Mesh, f: Callable, g: Callable,
                              axis: str = PARTICLE_AXIS,
                              exchange: str = "ragged",
                              interpret: bool | None = None,
                              nx: int = 5):
    """Round-5 TILED-STATE distributed PF step: the per-shard state
    stays in the v4 (t_data, 1024) layout ACROSS steps, like the
    single-device ``particle_tiled.step`` — lanes-last shard-local
    predict/update (rbg noise on TPU via a per-shard folded key),
    width-invariant segmented ends, then the compact -> tile-granular
    exchange -> v4 merge pipeline with the merge output chained
    directly as the next state (no per-step AoS <-> tiled transposes,
    the tax the round-4 per-shard program still paid).

    ``f(x, u, dt)`` / ``g(x, u)`` are the xp-parameterized lanes-last
    model functions (as in particle_tiled.step). ``exchange``: "ragged"
    (lax.ragged_all_to_all, TPU) or "ring" (ppermute emulation, any
    backend). NOISE STREAM: per-shard ``fold_in(key, shard)`` draw_t —
    deterministic, but width-DEPENDENT (unlike make_shard_map_step's
    partitionable global draws); the resample stage remains bitwise
    width-invariant given identical weights (tests/test_tiled_sharded).
    """
    from gpu_se_tpu.filters import particle_tiled as pft

    def step(state, u, z, dt, state_pdf: GaussianSum,
             measurement_pdf: GaussianSum):
        itp = (interpret if interpret is not None
               else jax.default_backend() != "tpu")
        key, kn, kr = jax.random.split(state.key, 3)
        r = jax.random.uniform(kr, ())

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis, None), P(), P(), P(), P(), P()),
            out_specs=P(axis, None),
            check_vma=False,
        )
        def sharded(tiled, u, z, dt, r, kn):
            from gpu_se_tpu.ops.resample_pallas4 import LANES

            s_idx = jax.lax.axis_index(axis)
            n_local = tiled.shape[0] * LANES
            kn_local = jax.random.fold_in(kn, s_idx)
            xn, w = pft.predict_update_local(
                tiled, u, z, dt, f, g, state_pdf, measurement_pdf,
                nx, kn_local)
            ends, prev = _segmented_ends(w.reshape(n_local), r, axis)
            ends_loc = (ends - (prev + 1)).astype(jnp.float32)
            body = pft.build_body(
                xn, ends_loc.reshape(-1, LANES), nx, with_index=False)
            return _a2a_compact_exchange_merge(
                body, prev, n_local, nx, axis,
                exchange=exchange, interpret=itp, return_tiled=True)

        new_tiled = sharded(state.tiled, u, z, dt, r, kn)
        from gpu_se_tpu.filters.particle_tiled import TiledPFState

        return TiledPFState(tiled=new_tiled, key=key)

    return step
