"""Probe the coarse-window resample formulation (v4) piece by piece.

The calibrated sweep (scripts/calibrated_ops.out) showed every fused
merge-kernel geometry LOSES to plain XLA (13.7-19.2 ms vs 9.7 ms at
2^20): the per-window one-hot matmul work dominates. v4 goes the other
way - stay in XLA, but exploit sortedness of the ancestors:

  output chunk i (b slots) draws only from source rows
  [o_i, o_i + 2b) where o_i = #{ends < i*b},  PROVIDED the per-chunk
  ancestor span is < 2b (guarded; lax.cond falls back to the exact
  scatter+cummax+gather path on pathological weight concentration).

Pieces timed here (calibrated method, CLAUDE.md):
  ends        : cumsum + floor + cummax only
  bnd         : + searchsorted of the 4097 chunk boundaries
  scatterhint : indices via unique+sorted hinted .set scatter + cummax
                (the current .at[].max scatter costs 6.8 ms)
  v4_taa      : full fast branch, local gather via take_along_axis
  v4_onehot   : full fast branch, local gather via one-hot einsum (MXU)
Each v4 variant is also checked bitwise against the XLA reference path
on the same inputs (fresh weights each call).

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_v4.py
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
    sorted_row_gather, systematic_resample_indices,
)

N = 2**20
B = 256            # output chunk slots
W = 2 * B          # source window rows per chunk
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


def boundaries(ends, n, b):
    # o_i = #{ends < i*b} for i = 0..n/b (inclusive end boundary)
    qs = jnp.arange(0, n + b, b, dtype=jnp.int32)
    return jnp.searchsorted(ends, qs, side="left").astype(jnp.int32)


def v4_fast(p, ends, o, n, b, w, local):
    nch = n // b
    big = jnp.int32(2**31 - 1)
    ends_pad = jnp.concatenate([ends, jnp.full((w,), big, jnp.int32)])
    p_pad = jnp.concatenate([p, jnp.zeros((w, p.shape[1]), p.dtype)])
    starts = o[:-1]  # (nch,)
    # coarse slice-gather: nch slices of w contiguous rows
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    ew = jax.lax.gather(
        ends_pad, starts[:, None], dn, slice_sizes=(w,),
        indices_are_sorted=True, mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # (nch, w)
    dnp = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )
    pw = jax.lax.gather(
        p_pad, starts[:, None], dnp, slice_sizes=(w, p.shape[1]),
        indices_are_sorted=True, mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # (nch, w, nx)
    slots = (
        jnp.arange(nch, dtype=jnp.int32)[:, None] * b
        + jnp.arange(b, dtype=jnp.int32)[None, :]
    )  # (nch, b)
    cnt = jnp.sum(
        (ew[:, None, :] < slots[:, :, None]).astype(jnp.int32), axis=2
    )  # (nch, b) local ancestor offset in window
    if local == "taa":
        out = jnp.take_along_axis(pw, cnt[:, :, None], axis=1)  # (nch, b, nx)
    else:
        onehot = (
            jnp.arange(w, dtype=jnp.int32)[None, None, :] == cnt[:, :, None]
        ).astype(jnp.float32)
        out = jnp.einsum(
            "bij,bjk->bik", onehot, pw, precision=jax.lax.Precision.HIGHEST
        )
    anc = o[:-1][:, None] + cnt
    return out.reshape(n, p.shape[1]), anc.reshape(n)


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
    def t_ends(p_, eps):
        p, w, r = prep(p_, eps)
        e = ends_of(w, r, N)
        return jnp.sum(e.astype(jnp.float32)) + p[0, 0]

    @jax.jit
    def t_bnd(p_, eps):
        p, w, r = prep(p_, eps)
        e = ends_of(w, r, N)
        o = boundaries(e, N, B)
        return (jnp.sum(e.astype(jnp.float32)) + jnp.sum(o.astype(jnp.float32))
                + p[0, 0])

    @jax.jit
    def t_scatterhint(p_, eps):
        p, w, r = prep(p_, eps)
        e = ends_of(w, r, N)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32), e[:-1] + 1])
        valid = starts <= e
        ks = jnp.arange(N, dtype=jnp.int32)
        # valid starts are strictly increasing -> unique; invalid ones go
        # to distinct out-of-bounds slots so the uniqueness hint is honest
        tgt = jnp.where(valid, starts, N + ks)
        seed_arr = jnp.zeros(N, jnp.int32).at[tgt].set(
            ks, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        idx = jax.lax.cummax(seed_arr)
        return jnp.sum(idx.astype(jnp.float32)) + p[0, 0]

    def make_v4(local):
        @jax.jit
        def t_v4(p_, eps):
            p, w, r = prep(p_, eps)
            e = ends_of(w, r, N)
            o = boundaries(e, N, B)
            out, anc = v4_fast(p, e, o, N, B, W, local)
            return jnp.sum(out, dtype=jnp.float32) + jnp.sum(
                anc.astype(jnp.float32))
        return t_v4

    @jax.jit
    def t_xla_full(p_, eps):
        p, w, r = prep(p_, eps)
        idx = jax.lax.optimization_barrier(systematic_resample_indices(w, r))
        out = sorted_row_gather(p, idx)
        return jnp.sum(out, dtype=jnp.float32) + jnp.sum(idx.astype(jnp.float32))

    # correctness first (one fresh input, bitwise vs XLA path)
    from functools import partial

    @partial(jax.jit, static_argnames=("local",))
    def check(p_, eps, local):
        p, w, r = prep(p_, eps)
        idx = jax.lax.optimization_barrier(systematic_resample_indices(w, r))
        ref = sorted_row_gather(p, idx)
        e = ends_of(w, r, N)
        o = boundaries(e, N, B)
        out, anc = v4_fast(p, e, o, N, B, W, local)
        span = jnp.max(o[1:] - o[:-1])
        return (jnp.sum(anc != idx), jnp.sum(jnp.any(out != ref, axis=1)),
                span)

    for local in ("taa", "onehot"):
        am, rm, span = check(parts, jnp.float32(rng.standard_normal()), local)
        print(f"check {local}: anc mism {int(am)}, row mism {int(rm)}, "
              f"max span {int(span)} (guard < {W})", flush=True)

    for name, fn in [
        ("null       ", t_null),
        ("ends       ", t_ends),
        ("bnd        ", t_bnd),
        ("scatterhint", t_scatterhint),
        ("v4_taa     ", make_v4("taa")),
        ("v4_onehot  ", make_v4("onehot")),
        ("xla_full   ", t_xla_full),
    ]:
        print(name, measure(fn, parts, rng), flush=True)


if __name__ == "__main__":
    main()
