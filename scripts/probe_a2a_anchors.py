"""Single-chip k-chain anchors for the round-5 a2a distributed resample.

Measures the full PF step on the real TPU (W=1 mesh, so the ragged
all-to-all and both v4 kernels run for real) for:

  nores     predict+update only
  v4        single-chip production default (pallas_systematic_resample_tiled)
  a2a       the distributed pipeline at W=1: segmented ends + v4 compact
            + ragged exchange + v4 merge (per-shard cost anchor)
  a2a_xla   same protocol with scatter compaction + XLA merge (quantifies
            why the kernel pipeline is required)

at n_local = 2^20 and 2^19 (the W=8 shard size for n_global=2^22/2^23).
Method of record: unrolled k-chain slope (CLAUDE.md timing minefield).

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_a2a_anchors.py
"""
import functools
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

from functools import partial

from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpu_se_tpu.filters import particle as pf_core
from gpu_se_tpu.models import bioreactor as bio
from gpu_se_tpu.parallel.mesh import PARTICLE_AXIS
from gpu_se_tpu.parallel import sharded as sh

CALLS = 15
K_LO, K_HI = 1, 9


def rig():
    from results._filter_bench import rig_dists

    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np),
                    jnp.float32)
    return x0, state_pdf, meas_pdf, f, g, u, z


def make_step(kind, rigt, n, mesh):
    x0, state_pdf, meas_pdf, f, g, u, z = rigt

    def step(st):
        st = pf_core.predict(st, u, jnp.float32(0.1), f, state_pdf)
        st = pf_core.update(st, u, z, g, meas_pdf)
        if kind == "nores":
            return st
        key, sub = jax.random.split(st.key)
        r = jax.random.uniform(sub, ())
        if kind == "v4":
            from gpu_se_tpu.ops.resample_pallas4 import (
                pallas_systematic_resample_tiled,
            )

            parts, _ = pallas_systematic_resample_tiled(
                st.particles, st.weights, r)
        elif kind in ("a2a_se", "a2a_nox", "a2a_noends"):
            # W=1 timing-only ablations of the a2a pipeline stages
            from gpu_se_tpu.ops.resample_coarse import ends_from_weights
            from gpu_se_tpu.ops.resample_pallas4 import BIG

            @partial(
                shard_map, mesh=mesh,
                in_specs=(P(PARTICLE_AXIS, None), P(PARTICLE_AXIS), P()),
                out_specs=(P(PARTICLE_AXIS, None), P(PARTICLE_AXIS)),
                check_vma=False,
            )
            def res(parts, w, r):
                nl = w.shape[0]
                if kind == "a2a_noends":
                    ends = jax.lax.cummax(
                        jnp.arange(nl, dtype=jnp.int32)
                        + (w[:1] > -1.0).astype(jnp.int32) - 1)
                    prev = jnp.int32(-1)
                elif kind == "a2a_se":
                    ends = ends_from_weights(w, r)   # single-chip ends
                    prev = jnp.int32(-1)
                else:
                    ends, prev = sh._segmented_ends(w, r, PARTICLE_AXIS)
                sr, se = sh._compact_survivors_v4(parts, ends, prev, False)
                sf = jnp.where(
                    se < BIG * 0.5,
                    jnp.concatenate([
                        (prev + 1).astype(jnp.float32)[None], se[:-1] + 1.0]),
                    BIG)
                if kind == "a2a_nox":
                    recv_rows, recv_ends = sr, se
                else:
                    in_off, send_sz = sh._send_windows(se, sf, nl, 1)
                    S = jax.lax.all_gather(send_sz, PARTICLE_AXIS)
                    off = jnp.cumsum(S, axis=0) - S
                    buf = jnp.concatenate([sr, se[:, None]], axis=1)
                    s_idx = jax.lax.axis_index(PARTICLE_AXIS)
                    init = jnp.zeros_like(buf).at[:, -1].set(BIG)
                    recv = jax.lax.ragged_all_to_all(
                        buf, init, in_off, send_sz,
                        off[s_idx], S[:, s_idx], axis_name=PARTICLE_AXIS)
                    recv_rows, recv_ends = recv[:, :-1], recv[:, -1]
                slot0 = jax.lax.axis_index(PARTICLE_AXIS) * nl
                out = sh._merge_received_v4(
                    recv_rows, recv_ends, slot0, nl, False)
                return out, jnp.full((nl,), 1.0 / nl, w.dtype)

            parts, _ = res(st.particles, st.weights, r)
        elif kind == "a2a_t":
            @partial(
                shard_map, mesh=mesh,
                in_specs=(P(PARTICLE_AXIS, None), P(PARTICLE_AXIS), P()),
                out_specs=(P(PARTICLE_AXIS, None), P(PARTICLE_AXIS)),
                check_vma=False,
            )
            def res(parts, w, r):
                return sh._distributed_systematic_resample_a2a_tiled(
                    parts, w, r, PARTICLE_AXIS, exchange="ragged")

            parts, _ = res(st.particles, st.weights, r)
        else:
            exch, merge, comp = {
                "a2a": ("ragged", "v4", "v4"),
                "a2a_xla": ("ragged", "xla", "xla"),
            }[kind]

            @partial(
                shard_map, mesh=mesh,
                in_specs=(P(PARTICLE_AXIS, None), P(PARTICLE_AXIS), P()),
                out_specs=(P(PARTICLE_AXIS, None), P(PARTICLE_AXIS)),
                check_vma=False,
            )
            def res(parts, w, r):
                return sh._distributed_systematic_resample_a2a(
                    parts, w, r, PARTICLE_AXIS,
                    exchange=exch, merge=merge, compact=comp)

            parts, _ = res(st.particles, st.weights, r)
        return pf_core.PFState(
            particles=parts,
            weights=jnp.full((n,), 1.0 / n, jnp.float32),
            key=key,
        )

    return step


def chain_fn(step, k, n):
    @jax.jit
    def run(p0, eps):
        st = pf_core.PFState(
            particles=p0 + eps * 1e-9,
            weights=jnp.full((n,), 1.0 / n, jnp.float32),
            key=jax.random.PRNGKey(jnp.abs(eps * 1e6).astype(jnp.int32)),
        )
        for _ in range(k):
            st = step(st)
        return jnp.sum(st.particles, dtype=jnp.float32)

    return run


def chain_tiled_sharded(rigt, k, n, mesh):
    """Round-5 tiled-state sharded step (a2a_ts): the W=1 per-shard
    anchor of the production tiled distributed pipeline."""
    import functools as ft

    from gpu_se_tpu.filters import particle_tiled as pft
    from gpu_se_tpu.parallel.sharded import make_shard_map_tiled_step

    x0, state_pdf, meas_pdf, f, g, u, z = rigt
    fs = ft.partial(bio.homeostatic_des, xp=jnp)
    gs = ft.partial(bio.static_outputs, xp=jnp)
    step = make_shard_map_tiled_step(mesh, fs, gs, exchange="ragged",
                                     interpret=False)

    @jax.jit
    def run(tiled0, eps):
        st = pft.TiledPFState(
            tiled=tiled0 + eps * 1e-9,
            key=jax.random.PRNGKey(jnp.abs(eps * 1e6).astype(jnp.int32)),
        )
        for _ in range(k):
            st = step(st, u, z, jnp.float32(0.1), state_pdf, meas_pdf)
        return jnp.sum(st.tiled[:, :640], dtype=jnp.float32)

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
    print(f"platform={jax.devices()[0].platform} k={K_LO}..{K_HI}",
          flush=True)
    rigt = rig()
    rng = np.random.default_rng(int(time.time() * 1000) % 2**31)
    mesh = Mesh(np.array(jax.devices()[:1]), (PARTICLE_AXIS,))

    kinds = sys.argv[1:] or ("nores", "v4", "a2a", "a2a_xla")
    for n in (2**20, 2**19):
        p0 = jnp.asarray(
            rigt[0].draw(jax.random.PRNGKey(rng.integers(2**31)), (n,)),
            jnp.float32)
        jax.block_until_ready(p0)
        for kind in kinds:
            if kind == "a2a_ts":
                from gpu_se_tpu.filters import particle_tiled as pft

                t0 = pft.tile(p0, jax.random.PRNGKey(0)).tiled
                jax.block_until_ready(t0)
                t_lo = measure(chain_tiled_sharded(rigt, K_LO, n, mesh),
                               t0, rng)
                t_hi = measure(chain_tiled_sharded(rigt, K_HI, n, mesh),
                               t0, rng)
                slope = (t_hi - t_lo) / (K_HI - K_LO)
                print(f"n=2^{int(np.log2(n))} {kind:8s} "
                      f"T({K_LO})={t_lo:8.3f}  T({K_HI})={t_hi:8.3f}  "
                      f"slope={slope:7.3f} ms/step", flush=True)
                continue
            step = make_step(kind, rigt, n, mesh)
            t_lo = measure(chain_fn(step, K_LO, n), p0, rng)
            t_hi = measure(chain_fn(step, K_HI, n), p0, rng)
            slope = (t_hi - t_lo) / (K_HI - K_LO)
            print(f"n=2^{int(np.log2(n))} {kind:8s} T({K_LO})={t_lo:8.3f}  "
                  f"T({K_HI})={t_hi:8.3f}  slope={slope:7.3f} ms/step",
                  flush=True)


if __name__ == "__main__":
    main()
