"""Attribute the tiled-state PF step's time at 2^20: k-chain slopes of
ablated stages (all data-dependent chains, wall-clock-seeded, scalar
float() fetch).

Legs:
  pu     — predict + update + ends only (kernel skipped; ends folded
           into the carried state so links chain)
  build  — pu + the (T,1024) body/pad construction (kernel skipped)
  full   — the production step
  fullx  — step with the resample swapped for the XLA scatter+cummax
           path ON THE TILED LAYOUT (untile -> resample -> retile)

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_tiled2.py [legs]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gpu_se_tpu.filters import particle_tiled as pft  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402
from gpu_se_tpu.ops.resample_coarse import ends_from_weights  # noqa: E402
from gpu_se_tpu.ops.resample_pallas4 import (  # noqa: E402
    BIG,
    ENDS_ROW,
    IDX_ROW,
    LANES,
    resample_tiled_core,
)
from scripts.probe_tiled import rig  # noqa: E402

N = 2 ** 20
CALLS = 12
K_LO, K_HI = 1, 9

F = functools.partial(bio.homeostatic_des, xp=jnp)
G = functools.partial(bio.static_outputs, xp=jnp)


def link(leg, st, u, z, state_pdf, meas_pdf):
    tiled = st.tiled
    t_data = tiled.shape[0]
    n = t_data * LANES
    key, kn, kr = jax.random.split(st.key, 3)
    x = jnp.stack([tiled[:, d * LANES:(d + 1) * LANES] for d in range(5)])
    deltas = F(x, u, jnp.float32(0.1))
    noise = state_pdf.draw_t(kn, n).reshape(5, t_data, LANES)
    xn = x + deltas + noise
    ys = G(xn, u)
    resid = z.reshape(-1, 1, 1) - ys
    w = meas_pdf.pdf_t(resid)
    r = jax.random.uniform(kr, (), dtype=jnp.float32)
    ends = ends_from_weights(w.reshape(n), r)

    if leg == "pu":
        # fold ends into the carried state (scaled tiny) so links chain
        newt = tiled + (xn[0] + ends.astype(jnp.float32).reshape(
            t_data, LANES) * 1e-20).mean() * 1e-9
        return pft.TiledPFState(tiled=newt, key=key)

    tpb = 4096 // LANES
    wt = 3 * tpb + 8
    idx_row = (
        jax.lax.broadcasted_iota(jnp.int32, (t_data, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (t_data, LANES), 1)
    ).astype(jnp.float32)
    groups = [xn[d] for d in range(5)]
    groups += [idx_row, ends.astype(jnp.float32).reshape(t_data, LANES),
               jnp.zeros((t_data, LANES), jnp.float32)]
    body = jnp.concatenate(groups, axis=1)
    li = jax.lax.broadcasted_iota(jnp.int32, (wt, 8 * LANES), 1)
    pad = jnp.where(
        (li >= ENDS_ROW * LANES) & (li < (ENDS_ROW + 1) * LANES),
        jnp.float32(BIG), jnp.float32(0.0))
    full = jnp.concatenate([body, pad], axis=0)

    if leg == "build":
        newt = full[:t_data] * (1.0 - 1e-20) + 1e-30
        return pft.TiledPFState(tiled=newt, key=key)

    if leg == "fullx":
        from gpu_se_tpu.ops.resample_coarse import indices_from_ends
        from gpu_se_tpu.filters.resampling import sorted_row_gather

        idx = jax.lax.optimization_barrier(indices_from_ends(ends))
        flat = jnp.transpose(
            full[:t_data].reshape(t_data, 8, LANES), (1, 0, 2)
        ).reshape(8, n)[:5].T
        out = sorted_row_gather(flat, idx)
        p8 = jnp.zeros((8, n), jnp.float32).at[:5].set(out.T)
        newt = (p8.reshape(8, t_data, LANES).transpose(1, 0, 2)
                .reshape(t_data, 8 * LANES))
        return pft.TiledPFState(tiled=newt, key=key)

    out_tiled = resample_tiled_core(full, ends, n)
    return pft.TiledPFState(tiled=out_tiled, key=key)


def chain(leg, k, u, z, state_pdf, meas_pdf):
    @jax.jit
    def run(tiled0, seed):
        st = pft.TiledPFState(
            tiled=tiled0 + 1e-9 * seed,
            key=jax.random.PRNGKey(seed.astype(jnp.int32)))
        for _ in range(k):
            st = link(leg, st, u, z, state_pdf, meas_pdf)
        return jnp.sum(st.tiled[:, :640], dtype=jnp.float32)

    return run


def measure(fn, arg0, rng, calls=CALLS):
    float(fn(arg0, jnp.float32(rng.standard_normal())))
    ts = []
    for _ in range(calls):
        seed = jnp.float32(abs(rng.standard_normal()) * 1e4)
        t0 = time.perf_counter()
        float(fn(arg0, seed))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    legs = sys.argv[1:] or ["pu", "build", "full", "fullx"]
    print(f"platform={jax.devices()[0].platform} N=2^20 tiled-step "
          f"ablation k={K_LO}..{K_HI}", flush=True)
    rng = np.random.default_rng(int(time.time() * 1000) % 2 ** 31)
    x0, state_pdf, meas_pdf, u, z = rig()
    parts0 = x0.draw(jax.random.PRNGKey(
        int(time.time() * 997) % 2**31), (N,))
    tiled0 = pft.tile(parts0, jax.random.PRNGKey(0)).tiled
    jax.block_until_ready(tiled0)
    for leg in legs:
        t_lo = measure(chain(leg, K_LO, u, z, state_pdf, meas_pdf),
                       tiled0, rng)
        t_hi = measure(chain(leg, K_HI, u, z, state_pdf, meas_pdf),
                       tiled0, rng)
        print(f"{leg:7s} T({K_LO})={t_lo:8.3f}  T({K_HI})={t_hi:8.3f}  "
              f"slope={(t_hi - t_lo) / (K_HI - K_LO):7.3f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
