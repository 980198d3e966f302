"""Pallas TPU kernels: tiled jumbo-window systematic resample (v4).

Round-3 finding (CLAUDE.md, probe_v8): every earlier kernel family —
v1/v3 merge scan, v6 coarse windows — bottoms out at ~0.7-1.2 us per
sequential pipeline unit (grid step / DMA wait), and all of them issue
~8-32k such units at 2^20, hence the ~8 ms resample floor. v4
restructures the op to ~n/4096 units plus dense vector work:

* **Tiled payload.** ``(T, 1024)`` float32 in HBM — row ``c`` is 128-lane
  tile ``c`` of the transposed payload: rows 0..4 particle state, row 5
  the ORIGINAL INDEX as exact f32 (ancestors come out as a gathered
  payload row — one mechanism for both the direct and compacted paths),
  row 6 the monotonized integer ``ends`` as exact f32, row 7 spare
  (carries the per-block max tile span out for the overflow check).
* **Jumbo double-buffered windows.** Each grid step processes B=4096
  output slots with ONE contiguous window DMA whose base comes from a
  scalar-prefetched, scatter-free bracketing of ``ends[::B]`` (a tiny
  dense compare in the XLA prolog).
* **In-kernel exact per-tile offsets** (compare-accumulate over the
  window's ends row), **three-tile slabs fetched as one-hot matmuls**
  on the MXU (exact: one unit coefficient per row, HIGHEST precision),
  and a **branchless vectorized lower-bound search** with single-tile
  ``take_along_axis`` gathers.
* **Degenerate weights: compact first.** Real PF weights after an
  update are heavy-tailed (bench rig: effective sample size ~1e-3 of N),
  so zero-weight runs make ancestor POSITION spans per output tile
  unbounded even though only <=128 DISTINCT ancestors exist. A
  source-major compaction kernel streams the tiled payload, keeps only
  entries with ``ends_k > ends_{k-1}`` (exactly the possible ancestors),
  and writes them contiguously — in compacted space the per-tile span is
  <=128 UNCONDITIONALLY (strictly increasing integer ends), so the main
  kernel needs no further fallback. The compaction is skip-gated per
  source tile (a dead tile costs ~a dozen vector ops), which is
  precisely the degenerate regime. ``lax.cond`` picks: direct kernel
  output when the span/coverage flags hold, compaction + kernel re-run
  otherwise.

Both paths are bitwise-equal to the XLA scatter+cummax formulation
(``filters/resampling.py``): integer compares on the same ``ends``,
exact one-hot gathers.

No while loops, no data-dependent trip counts — the deadlock class that
wedged v1's large-B geometries (CLAUDE.md) is structurally absent.

Reference being replaced: the CUDA resample pipeline at
/root/reference/filter/particle.py:296-316 (torch cumsum -> Nicely
search kernel -> fancy-index gather).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IDX_ROW = 5                  # payload row: original index as exact f32
ENDS_ROW = 6                 # payload row: ends as exact f32
SPAN_ROW = 7                 # output row: per-block max tile span
BIG = float(2 ** 25)         # ends padding; > any slot, exact in f32
LANES = 128
# trace-time ablation knob for scripts/probe_v10.py ("full" in
# production; other values produce WRONG results, timing only)
VARIANT = "full"


# ----------------------------------------------------------------------
# main kernel: output-major jumbo-window search + gather
#
# ``rows`` generalizes the tile height (round 5): 8 for the PF payload,
# 24 for the GSUKF bank (5 means + 15 symmetric-packed covariance
# columns). The scratch-row convention is always rows-3/-2/-1 =
# index/ends/span.
# ----------------------------------------------------------------------
def _kernel(base_ref, payload_hbm, out_ref, win, sems,
            *, n, tpb, wt, nblocks, rows=8, variant="full"):
    ends_row = rows - 2
    span_row = rows - 1
    b = tpb * LANES
    j = pl.program_id(0)

    def slot_rows(slot):
        # scratch is flattened (2*wt, 1024); hint the prover that the
        # slot offset keeps the (8, 128) sublane tiling
        return pl.ds(pl.multiple_of(slot * wt, 8), wt)

    def dma(slot, blk):
        # window bases are multiples of tpb (>= 8) by construction
        return pltpu.make_async_copy(
            payload_hbm.at[pl.ds(pl.multiple_of(base_ref[blk], 8), wt)],
            win.at[slot_rows(slot)],
            sems.at[slot],
        )

    if variant == "nodma":
        cur = jax.lax.rem(j, 2)
    else:
        @pl.when(j == 0)
        def _():
            dma(0, 0).start()
            if nblocks > 1:
                dma(1, 1).start()

        cur = jax.lax.rem(j, 2)
        dma(cur, j).wait()

    # ---- exact window-relative ancestor starts per output tile -------
    # a_hat[t] = #{window ends < jB + 128 t} for t = 0..tpb (inclusive:
    # the extra threshold is the next block's boundary, used for the
    # overflow flag). Entries before the window have value < jB (window
    # base < A_j by construction); entries past the window's coverage
    # are >= the largest threshold whenever the block-level bracket jump
    # is within the window tolerance (the prolog flags the rest).
    #
    # Round 5: the ends sequence is globally NON-DECREASING (cummax
    # monotonization upstream; BIG pads at the tail), so the count
    # splits exactly into full rows + one boundary row:
    #   rc[t]  = #{window rows whose LAST lane < thr_t}  (full rows —
    #            every lane <= rowlast < thr)
    #   a_hat  = 128 rc + #{lanes of row rc < thr_t}     (rows past rc
    #            start >= row rc's last >= thr)
    # One (tpb+1, wt) compare + one one-hot matmul replaces the wt-row
    # compare-accumulate loop (~0.9 us/block of VPU work at wt=104).
    thr = (jax.lax.broadcasted_iota(jnp.int32, (tpb + 1, 1), 0) * LANES
           + j * b).astype(jnp.float32)
    window = win[slot_rows(cur)]                     # (wt, rows*128)
    wends = window[:, ends_row * LANES:(ends_row + 1) * LANES]
    rowlast_t = jnp.transpose(
        wends[:, LANES - 1:LANES], (1, 0))           # (1, wt)
    below = (rowlast_t < thr).astype(jnp.float32)    # (tpb+1, wt)
    rc = jnp.sum(below, axis=1, keepdims=True).astype(jnp.int32)
    colw = jax.lax.broadcasted_iota(jnp.int32, (tpb + 1, wt), 1)
    oh_rc = jnp.where(colw == rc, 1.0, 0.0)
    dn = (((1,), (0,)), ((), ()))
    brow = jax.lax.dot_general(
        oh_rc, wends, dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)         # (tpb+1, 128)
    lanecnt = jnp.sum((brow < thr).astype(jnp.int32), axis=1,
                      keepdims=True)
    acc = rc * LANES + lanecnt                       # (tpb+1, 1)
    a_hat = acc[:tpb]                       # (tpb, 1) window-relative
    spans = acc[1:] - acc[:tpb]             # (tpb, 1)
    # overflow telemetry rides payload row 7 (a separate (1, 1) output
    # block is rejected by the Mosaic block divisibility rule)
    span_max = jnp.max(spans)

    # ---- three-tile slabs for all output tiles via one-hot matmuls ---
    # (span cap 256 on the direct path; the compacted path guarantees
    # spans <= 128 so three tiles are always sufficient there too)
    c_vec = jax.lax.shift_right_logical(a_hat, 7)   # (tpb, 1) slab tile
    col = jax.lax.broadcasted_iota(jnp.int32, (tpb, wt), 1)
    oh_a = jnp.where(col == c_vec, 1.0, 0.0)
    oh_b = jnp.where(col == c_vec + 1, 1.0, 0.0)
    oh_c = jnp.where(col == c_vec + 2, 1.0, 0.0)
    dn = (((1,), (0,)), ((), ()))
    window = win[slot_rows(cur)]                     # (wt, 1024)
    # exact: one unit coefficient per row, HIGHEST avoids bf16 passes
    g_a = jax.lax.dot_general(
        oh_a, window, dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    g_b = jax.lax.dot_general(
        oh_b, window, dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    g_c = jax.lax.dot_general(
        oh_c, window, dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)         # (tpb, 1024)

    va = g_a[:, ends_row * LANES:(ends_row + 1) * LANES]  # (tpb, 128)
    vb = g_b[:, ends_row * LANES:(ends_row + 1) * LANES]
    vc = g_c[:, ends_row * LANES:(ends_row + 1) * LANES]

    # ---- branchless lower-bound search: pos = #{window ends < slot} --
    lane = jax.lax.broadcasted_iota(jnp.int32, (tpb, LANES), 1)
    slot_f = (j * b + LANES * jax.lax.broadcasted_iota(
        jnp.int32, (tpb, LANES), 0) + lane).astype(jnp.float32)
    c128 = c_vec * LANES                    # (tpb, 1), broadcasts
    pos = jnp.broadcast_to(a_hat, (tpb, LANES))
    bound = a_hat + 257

    def value_at(p):
        rel = p - c128                      # in [0, 384) when no overflow
        qa = jnp.clip(rel, 0, LANES - 1)
        qb = jnp.clip(rel - LANES, 0, LANES - 1)
        qc = jnp.clip(rel - 2 * LANES, 0, LANES - 1)
        ga = jnp.take_along_axis(va, qa, axis=1)
        gb = jnp.take_along_axis(vb, qb, axis=1)
        gc = jnp.take_along_axis(vc, qc, axis=1)
        return jnp.where(rel < LANES, ga,
                         jnp.where(rel < 2 * LANES, gb, gc))

    for step in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        nxt = pos + step
        ok = (nxt <= bound) & (value_at(nxt - 1) < slot_f)
        pos = jnp.where(ok, nxt, pos)

    # ---- payload gather (incl. the original-index row) ---------------
    rel = pos - c128
    qa = jnp.clip(rel, 0, LANES - 1)
    qb = jnp.clip(rel - LANES, 0, LANES - 1)
    qc = jnp.clip(rel - 2 * LANES, 0, LANES - 1)
    pick_a = rel < LANES
    pick_b = rel < 2 * LANES
    for s in range(rows):
        if s == span_row:
            out_ref[:, s * LANES:(s + 1) * LANES] = jnp.broadcast_to(
                span_max.astype(jnp.float32), (tpb, LANES))
            continue
        ra = jnp.take_along_axis(g_a[:, s * LANES:(s + 1) * LANES], qa, axis=1)
        rb = jnp.take_along_axis(g_b[:, s * LANES:(s + 1) * LANES], qb, axis=1)
        rc = jnp.take_along_axis(g_c[:, s * LANES:(s + 1) * LANES], qc, axis=1)
        out_ref[:, s * LANES:(s + 1) * LANES] = jnp.where(
            pick_a, ra, jnp.where(pick_b, rb, rc))

    if variant != "nodma":
        @pl.when(j + 2 < nblocks)
        def _():
            dma(cur, j + 2).start()


def _run_main_kernel(tiled, base_tile, n, tpb, wt, interpret, rows=8):
    nblocks = n // (tpb * LANES)
    t_data = n // LANES
    kernel = functools.partial(
        _kernel, n=n, tpb=tpb, wt=wt, nblocks=nblocks, rows=rows,
        variant=VARIANT
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((tpb, rows * LANES), lambda j, base: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * wt, rows * LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_tiled, = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_data, rows * LANES), jnp.float32),
        ],
        interpret=interpret,
    )(base_tile, tiled)
    return out_tiled


# ----------------------------------------------------------------------
# compaction kernel: keep entries with ends_k > ends_{k-1}
#
# Fully block-vectorized — the first cut looped over source tiles with
# a pl.when-guarded placement body and measured ~7.5 ms at 2^20 on
# device (per-tile predication + sequential SMEM carries); this version
# processes all 32 tiles of a grid step with batched (32, 128) vector
# ops and places the block's dense compacted segment into a staging
# ring via two exact one-hot matmuls (each output position receives
# exactly one unit coefficient, so HIGHEST-precision sums are exact).
# ----------------------------------------------------------------------
RING = 48          # staging ring rows (6 flushable groups of 8)


def _compact_kernel(in_ref, dummy_ref, out_hbm, prev_ref, r_ref, stage,
                    sems, *, tiles_per_step, rows=8, ring=RING):
    del dummy_ref
    RING = ring
    ends_row = rows - 2
    span_row = rows - 1
    j = pl.program_id(0)
    nsteps = pl.num_programs(0)
    tps = tiles_per_step

    lane32 = jax.lax.broadcasted_iota(jnp.int32, (tps, LANES), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (tps, 1), 0)
    ring_row = jax.lax.broadcasted_iota(jnp.int32, (RING, tps), 0)

    def pad_rows(rws):
        # reset the given static ring-row slice to the pad pattern
        ri = jax.lax.broadcasted_iota(
            jnp.int32, (len(range(*rws.indices(RING))), rows * LANES), 1)
        stage[rws] = jnp.where(
            (ri >= ends_row * LANES) & (ri < (ends_row + 1) * LANES),
            BIG, 0.0)

    @pl.when(j == 0)
    def _():
        prev_ref[0] = -1.0
        r_ref[0] = 0   # total kept so far
        r_ref[1] = 0   # flushed tile-rows so far
        pad_rows(slice(0, RING))

    # ---- keep mask + ranks for the whole block -----------------------
    ends32 = in_ref[:, ends_row * LANES:(ends_row + 1) * LANES]
    rolled = pltpu.roll(ends32, 1, axis=1)
    lastcol = ends32[:, LANES - 1:LANES]              # (tps, 1)
    prevrow_last = pltpu.roll(lastcol, 1, axis=0)
    first_prev = jnp.where(rowi == 0, prev_ref[0], prevrow_last)
    prevv = jnp.where(lane32 == 0, first_prev, rolled)
    keep = (ends32 > prevv).astype(jnp.float32)       # (tps, 128)
    prev_ref[0] = ends32[tps - 1, LANES - 1]

    rk = keep
    for sh in (1, 2, 4, 8, 16, 32, 64):
        rl = pltpu.roll(rk, sh, axis=1)
        rk = rk + jnp.where(lane32 >= sh, rl, 0.0)
    cnt = rk[:, LANES - 1:LANES]                      # (tps, 1) f32
    inc = cnt
    sh = 1
    while sh < tps:        # log2(tps) shifts (tps is 32 or 64)
        rl = pltpu.roll(inc, sh, axis=0)
        inc = inc + jnp.where(rowi >= sh, rl, 0.0)
        sh *= 2
    off = (inc - cnt).astype(jnp.int32)               # exclusive (tps, 1)
    totcnt = inc[tps - 1, 0].astype(jnp.int32)        # scalar
    cnt_i = cnt.astype(jnp.int32)

    # ---- local inversion: kept entry with rank m+1 -> slot m ---------
    lpos = jnp.zeros((tps, LANES), jnp.int32)
    for step in (64, 32, 16, 8, 4, 2, 1):
        nxt = lpos + step
        v = jnp.take_along_axis(rk, jnp.clip(nxt - 1, 0, LANES - 1), axis=1)
        ok = (nxt <= LANES) & (v < (lane32 + 1).astype(jnp.float32))
        lpos = jnp.where(ok, nxt, lpos)
    lpos = jnp.clip(lpos, 0, LANES - 1)

    # ---- dense placement geometry ------------------------------------
    r0 = r_ref[0]
    start = r0 + off                                  # (tps, 1) global
    shift = jax.lax.rem(start, LANES)                 # (tps, 1)
    g_a = jax.lax.shift_right_logical(start, 7)       # global dense row
    ring_a = jax.lax.rem(g_a, RING)                   # (tps, 1)
    ring_b = jax.lax.rem(g_a + 1, RING)
    idx_a = jnp.clip(lane32 - shift, 0, LANES - 1)
    idx_b = jnp.clip(lane32 + LANES - shift, 0, LANES - 1)
    mask_a = ((lane32 >= shift) & (lane32 - shift < cnt_i)
              ).astype(jnp.float32)
    mask_b = ((lane32 + LANES - shift < cnt_i)).astype(jnp.float32)

    # one-hots over ring rows ((tps,1) -> (1,tps) transpose, v6-style)
    oh_a = jnp.where(
        ring_row == jnp.transpose(ring_a, (1, 0)), 1.0, 0.0)
    oh_b = jnp.where(
        ring_row == jnp.transpose(ring_b, (1, 0)), 1.0, 0.0)
    dn = (((1,), (0,)), ((), ()))
    hit_a = jax.lax.dot_general(
        oh_a, mask_a, dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # (RING, 128)
    hit_b = jax.lax.dot_general(
        oh_b, mask_b, dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    for s in range(rows):
        if s == span_row:
            continue
        vals = in_ref[:, s * LANES:(s + 1) * LANES]
        comp = jnp.take_along_axis(vals, lpos, axis=1)
        pa = jnp.take_along_axis(comp, idx_a, axis=1) * mask_a
        pb = jnp.take_along_axis(comp, idx_b, axis=1) * mask_b
        ca = jax.lax.dot_general(
            oh_a, pa, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        cb = jax.lax.dot_general(
            oh_b, pb, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        sl = slice(s * LANES, (s + 1) * LANES)
        old = stage[:, sl]
        stage[:, sl] = jnp.where(
            (hit_a + hit_b) > 0.5, ca + cb, old)

    r_ref[0] = r0 + totcnt

    # ---- flush complete 8-row groups ---------------------------------
    def flush_one():
        fr = pl.multiple_of(r_ref[1], 8)
        ring_fr = jax.lax.rem(fr, RING)   # in {0, 8, ..., 40}
        # static 6-way select of the ring chunk (no dynamic VMEM rows)
        for g in range(RING // 8):
            @pl.when(ring_fr == g * 8)
            def _(g=g):
                cp = pltpu.make_async_copy(
                    stage.at[pl.ds(g * 8, 8)],
                    out_hbm.at[pl.ds(fr, 8)],
                    sems.at[0],
                )
                cp.start()
                cp.wait()
                pad_rows(slice(g * 8, g * 8 + 8))
        r_ref[1] = fr + 8

    # a block adds <= tps dense rows; up to tps//8 + 1 groups complete
    for _k in range(tps // 8 + 1):
        @pl.when(r_ref[1] + 8 <= jax.lax.shift_right_logical(r_ref[0], 7))
        def _():
            flush_one()

    @pl.when(j == nsteps - 1)
    def _():
        flush_one()   # the partial tail group (pad beyond the cursor)


def _compact(tiled, n, wt_out, interpret, rows=8, tiles_per_step=32):
    """Compacted tiled payload: kept entries contiguous, tail = pad."""
    ends_row = rows - 2
    t_data = n // LANES
    # the grid must cover t_data exactly; t_data is always a multiple
    # of 32 (n % 4096 == 0), so fall back to 32 when 64 doesn't divide
    if t_data % tiles_per_step != 0 or t_data < tiles_per_step:
        tiles_per_step = 32
    t_alloc_out = t_data + wt_out + 8
    # staging ring: RING - tps >= 8 rows of slack before a wrap can
    # reach unflushed data (RING=48 for the production tps=32)
    ring = ((tiles_per_step + 15) // 8) * 8 + 8
    ring = max(ring, RING) if tiles_per_step <= 32 else ring
    nsteps = t_data // tiles_per_step
    # prefilled output (pad pattern), donated through an alias so the
    # kernel only overwrites the kept prefix
    prefill = jnp.zeros((t_alloc_out, rows * LANES), jnp.float32)
    prefill = prefill.at[:, ends_row * LANES:(ends_row + 1) * LANES].set(BIG)

    kernel = functools.partial(
        _compact_kernel, tiles_per_step=tiles_per_step, rows=rows,
        ring=ring,
    )
    out, = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((tiles_per_step, rows * LANES), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # aliased prefill
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[
            jax.ShapeDtypeStruct((t_alloc_out, rows * LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.float32),   # prev ends value
            pltpu.SMEM((2,), jnp.int32),     # kept count, flush cursor
            pltpu.VMEM((ring, rows * LANES), jnp.float32),  # staging ring
            pltpu.SemaphoreType.DMA((1,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tiled[:t_data], prefill)
    return out


# ----------------------------------------------------------------------
# public entry
# ----------------------------------------------------------------------
def _pad_n(n: int, block: int) -> int:
    return ((n + block - 1) // block) * block


def _pad_ends_f32(ends, n: int, n_pad: int, tail: int):
    """Flat f32 ends of length n_pad + tail: the real monotonized ends,
    then STRICTLY-INCREASING above-range pads ``BIG + 256 i`` for the
    padded slots (round 5, arbitrary-n support). Monotone increase keeps
    the kernels' sortedness invariants; distinct 256-buckets keep the
    sampled degenerate pre-check from misreading the pad region as a
    dead run; all values are multiples of 256 <= 2^26, exact in f32.
    The window-overhang tail keeps plain BIG (never sampled)."""
    pad = BIG + 256.0 * jnp.arange(n_pad - n, dtype=jnp.float32)
    return jnp.concatenate([
        ends.astype(jnp.float32), pad,
        jnp.full((tail,), BIG, jnp.float32),
    ])


def v4_applicable(first_leaf, n: int, block: int = 4096) -> bool:
    """Shape gate for the tiled kernel: (n, nx<=5) payload (rows 5/6/7
    of the tile carry index/ends/span). Round 5: ANY n >= 2^12 —
    non-block-multiples are padded with above-range ends entries that
    can never be selected, so every size rides the kernel (the XLA
    fallback at odd sizes measured 10-15x slower at 2^22.5).

    Upper bound: indices, ends, and slot thresholds ride in f32 tile
    rows, exact only for integers <= 2^24 (the padded slot count) —
    beyond that the kernel would be silently wrong, so fall back."""
    return (
        first_leaf.ndim == 2
        and first_leaf.shape[1] <= IDX_ROW
        and n >= 2**12
        and _pad_n(n, block) <= 2**24
    )


def resample_tiled_core(
    tiled: jax.Array, ends: jax.Array, n: int,
    block: int = 4096, interpret: bool = False, rows: int = 8,
    compact_tps: int = 64,
) -> jax.Array:
    """Resample a payload ALREADY in the (t_alloc, 1024) tiled layout.

    ``tiled`` must carry the particle dims in tile rows 0..nx-1, the
    original index (exact f32 iota) in row ``IDX_ROW``, and the
    monotonized integer ``ends`` (exact f32, ``BIG`` beyond ``n``) in
    row ``ENDS_ROW``; ``ends`` is the same sequence as a flat int32
    (n,) vector, used for the window-base bracketing and the
    degenerate-path routing. Returns the resampled (t_data, 1024) tiled
    payload — the round-5 tiled-state PF step chains this output
    directly into the next step's input, so the (n, nx) <-> tiled
    transposes (~0.8 ms/step at 2^20, VERDICT r4 weak #4) never run.
    """
    b = block
    assert b % LANES == 0 and n % b == 0 and n >= b and n <= 2**24
    assert rows % 8 == 0
    ends_row = rows - 2
    span_row = rows - 1
    tpb = b // LANES
    wt = 3 * tpb + 8
    nblocks = n // b
    t_data = n // LANES
    t_alloc = t_data + wt
    assert tiled.shape == (t_alloc, rows * LANES), tiled.shape

    # ---- direct-path window bases + coverage flags -------------------
    qs = jnp.arange(nblocks + 1, dtype=jnp.int32)[:, None] * b
    p_direct = jnp.sum((ends[::b][None, :] < qs).astype(jnp.int32), axis=1)
    base_direct = jnp.clip(
        (p_direct[:-1] - 1) * tpb, 0, t_alloc - wt).astype(jnp.int32)
    block_overflow = jnp.max(p_direct[1:] - p_direct[:-1]) >= 3
    # cheap sampled pre-check: 256-strided entries sharing a 128-value
    # bucket imply a >=257 span — catches the common degenerate case
    # WITHOUT paying for a doomed direct-kernel run first (not
    # exhaustive: the in-kernel span flag remains the exact guard)
    s256 = jax.lax.shift_right_logical(
        jnp.maximum(ends[::2 * LANES], 0), 7)
    pre_overflow = jnp.any(s256[1:] == s256[:-1]) | block_overflow

    def compacted(tiled):
        ctiled = _compact(tiled, n, wt, interpret, rows=rows,
                          tiles_per_step=compact_tps)
        c_ends_sample = ctiled.reshape(-1)[
            ends_row * LANES::rows * LANES]     # first ends lane per tile
        # bracket with the per-B-entries sample: compacted entry i*b sits
        # at tile i*tpb, lane 0 — i.e. every tpb-th tile's first ends lane
        c_sample = c_ends_sample[::tpb][:nblocks]
        p_c = jnp.sum(
            (c_sample[None, :] < qs.astype(jnp.float32)).astype(jnp.int32),
            axis=1)
        # narrower window than the direct path (round 5): compacted ends
        # are STRICTLY increasing, so a B-slot block consumes <= B+1
        # entries and the sampled bracket is off by <= tpb tiles — the
        # ancestor reach is base + 2*tpb + 1 tiles (+2 slab overhang),
        # vs 3*tpb+8 for the direct path's jump-tolerant window. Cuts
        # the per-block DMA bytes and slab-matmul K by ~30%.
        wt_c = 2 * tpb + 8
        base_c = jnp.clip(
            (p_c[:-1] - 1) * tpb, 0,
            ctiled.shape[0] - wt_c).astype(jnp.int32)
        return _run_main_kernel(
            ctiled, base_c, n, tpb, wt_c, interpret, rows=rows)

    def direct_then_check(tiled):
        out_direct = _run_main_kernel(
            tiled, base_direct, n, tpb, wt, interpret, rows=rows)
        span_max = jnp.max(out_direct[:, span_row * LANES])
        return jax.lax.cond(
            span_max > 2 * LANES, compacted, lambda _t: out_direct, tiled
        )

    return jax.lax.cond(pre_overflow, compacted, direct_then_check, tiled)


def bank_rows(nx: int) -> int:
    """Tile height for the (means, covariances) bank payload: nx mean
    columns + nx(nx+1)/2 symmetric-packed covariance columns + 3 scratch
    rows (index/ends/span), rounded up to the (8, 128) sublane tile."""
    cols = nx + nx * (nx + 1) // 2
    return ((cols + 3 + 7) // 8) * 8


def bank_applicable(means, covs, n: int, block: int = 4096) -> bool:
    """Gate for the bank kernel: consistent (N, nx)/(N, nx, nx) f32
    shapes, block-multiple N within f32 index exactness, and a tile
    height the VMEM window budget tolerates (nx=5 -> 24 rows)."""
    if means.ndim != 2 or covs.ndim != 3:
        return False
    nx = means.shape[1]
    return (
        covs.shape[1:] == (nx, nx)
        and means.dtype == jnp.float32 and covs.dtype == jnp.float32
        and bank_rows(nx) <= 32
        and n >= 2**12 and _pad_n(n, block) <= 2**24
    )


def pallas_systematic_resample_bank(
    means: jax.Array, covs: jax.Array, weights: jax.Array, r: jax.Array,
    block: int = 4096, interpret: bool = False,
):
    """Fused systematic resample of a Gaussian bank (means, covariances)
    through the tiled jumbo-window kernel — the round-5 v4-class port of
    the GSUKF bank resample (VERDICT r4 weak #2; the packed-ends kernel
    it replaces measured ~3.7 ms of the 9.64 ms step at 2^18).

    The covariance payload is SYMMETRIC-PACKED: only the nx(nx+1)/2
    upper-triangle columns ride the kernel and the output mirrors them
    — 20 payload columns instead of 30 for nx=5, fitting a 24-row tile.
    Callers must provide exactly symmetric covariances (update_core
    symmetrizes K P K^T explicitly); given that, the output is
    bitwise-equal to the XLA scatter+cummax + sorted-gather path.

    Returns ``(new_means, new_covs, ancestors)``.

    Reference twin: /root/reference/filter/gs_ukf.py:409-436 (the CUDA
    systematic-resample + fancy-index gather over the bank arrays).
    """
    import numpy as np

    n, nx = means.shape
    rows = bank_rows(nx)
    ntri = nx * (nx + 1) // 2
    assert bank_applicable(means, covs, n, block)
    b = block
    n_pad = _pad_n(n, b)
    tpb = b // LANES
    wt = 3 * tpb + 8
    t_data = n_pad // LANES
    t_alloc = t_data + wt
    ends_row = rows - 2
    idx_row = rows - 3

    from gpu_se_tpu.ops.resample_coarse import ends_from_weights

    ends = ends_from_weights(weights, r)
    ends_f = _pad_ends_f32(ends, n, n_pad, t_alloc * LANES - n_pad)
    ends_core = ends_f[:n_pad].astype(jnp.int32)

    tri_i, tri_j = np.triu_indices(nx)
    tri_cols = jnp.stack(
        [covs[:, int(i), int(j)] for i, j in zip(tri_i, tri_j)]
    )                                              # (ntri, N)

    pR = jnp.zeros((rows, t_alloc * LANES), jnp.float32)
    pR = pR.at[:nx, :n].set(means.T)
    pR = pR.at[nx:nx + ntri, :n].set(tri_cols)
    pR = pR.at[idx_row, :n_pad].set(jnp.arange(n_pad, dtype=jnp.float32))
    pR = pR.at[ends_row].set(ends_f)
    tiled = (
        pR.reshape(rows, t_alloc, LANES)
        .transpose(1, 0, 2)
        .reshape(t_alloc, rows * LANES)
    )

    out_tiled = resample_tiled_core(
        tiled, ends_core, n_pad, block=block, interpret=interpret,
        rows=rows)

    back = (
        out_tiled.reshape(t_data, rows, LANES)
        .transpose(1, 0, 2)
        .reshape(rows, n_pad)[:, :n]
    )
    new_means = back[:nx].T
    tri = back[nx:nx + ntri]                       # (ntri, N)
    k = 0
    cov_rows = [[None] * nx for _ in range(nx)]
    for i, j in zip(tri_i, tri_j):
        cov_rows[int(i)][int(j)] = tri[k]
        cov_rows[int(j)][int(i)] = tri[k]
        k += 1
    new_covs = jnp.transpose(
        jnp.stack([jnp.stack(r_) for r_ in cov_rows]), (2, 0, 1))
    anc = jnp.clip(back[idx_row].astype(jnp.int32), 0, n - 1)
    return new_means, new_covs, anc


def pallas_systematic_resample_tiled(
    particles: jax.Array, weights: jax.Array, r: jax.Array,
    block: int = 4096, interpret: bool = False,
):
    """Fused systematic resample: returns (resampled_particles, ancestors).

    Bitwise-equal to ``systematic_resample_indices`` + row gather
    (filters/resampling.py) for any weights: both the direct and the
    compacted path compute the identical ``ends``-count formulation with
    exact int-valued f32 compares and exact one-hot gathers.

    Requirements: ``particles (n, nx<=5) f32``; any ``n`` with
    ``n`` padded up to a block multiple <= 2^24 (pad entries carry
    above-range ends and are never selected; outputs slice to n).
    """
    n, nx = particles.shape
    assert nx <= IDX_ROW, f"payload of {nx} cols exceeds {IDX_ROW}"
    b = block
    n_pad = _pad_n(n, b)
    assert b % LANES == 0 and n_pad <= 2**24
    tpb = b // LANES
    # window tiles: the ancestor range of a block spans at most
    # B*(jump+1) positions past the (sampled, 128-aligned) base, where
    # ``jump`` is the block-boundary bracket jump. Direct path: sized
    # for jump <= 2 plus 3 slab tiles of overhang (covers every
    # non-degenerate weight family measured); compacted path: jump <= 1
    # holds unconditionally, so the same window is ample.
    wt = 3 * tpb + 8
    t_data = n_pad // LANES
    t_alloc = t_data + wt

    from gpu_se_tpu.ops.resample_coarse import ends_from_weights

    ends = ends_from_weights(weights, r)
    ends_f = _pad_ends_f32(ends, n, n_pad, t_alloc * LANES - n_pad)
    ends_core = ends_f[:n_pad].astype(jnp.int32)

    # ---- pre-tiled payload (T, 1024): row c = 128-lane tile c --------
    p8 = jnp.zeros((8, t_alloc * LANES), jnp.float32)
    p8 = p8.at[:nx, :n].set(particles.astype(jnp.float32).T)
    p8 = p8.at[IDX_ROW, :n_pad].set(jnp.arange(n_pad, dtype=jnp.float32))
    p8 = p8.at[ENDS_ROW].set(ends_f)
    tiled = (
        p8.reshape(8, t_alloc, LANES)
        .transpose(1, 0, 2)
        .reshape(t_alloc, 8 * LANES)
    )

    out_tiled = resample_tiled_core(
        tiled, ends_core, n_pad, block=block, interpret=interpret)

    back = (
        out_tiled.reshape(t_data, 8, LANES)
        .transpose(1, 0, 2)
        .reshape(8, n_pad)
    )
    parts = back[:nx, :n].T
    anc = jnp.clip(back[IDX_ROW, :n].astype(jnp.int32), 0, n - 1)
    return parts, anc
