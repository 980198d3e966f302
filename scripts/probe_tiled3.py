"""Decompose the tiled step's predict+update (pu) stage at 2^20 — it
measured 1.23 ms/step (probe_tiled2) vs the untiled AoS path's 0.65.

Legs: dyn (dynamics only) | noise (draw_t only) | noise_aos (the AoS
draw() for comparison, different stream) | pdf (measurement weights +
ends) | pu (all three; = probe_tiled2's pu).

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_tiled3.py [legs]
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
from gpu_se_tpu.ops.resample_pallas4 import LANES  # noqa: E402
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

    acc = None
    if leg in ("dyn", "pu"):
        deltas = F(x, u, jnp.float32(0.1))
        acc = deltas[0]
    if leg in ("noise", "pu"):
        noise = state_pdf.draw_t(kn, n).reshape(5, t_data, LANES)
        acc = noise[0] if acc is None else acc + noise[0]
    if leg == "noise_aos":
        noise = state_pdf.draw(kn, (n,))          # (n, 5), AoS layout
        acc = noise[:, 0].reshape(t_data, LANES)
    if leg in ("pdf", "pu"):
        ys = G(x, u)
        resid = z.reshape(-1, 1, 1) - ys
        w = meas_pdf.pdf_t(resid)
        r = jax.random.uniform(kr, (), dtype=jnp.float32)
        ends = ends_from_weights(w.reshape(n), r)
        e = ends.astype(jnp.float32).reshape(t_data, LANES) * 1e-20
        acc = e if acc is None else acc + e

    newt = tiled + acc.mean() * 1e-9
    return pft.TiledPFState(tiled=newt, key=key)


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
    legs = sys.argv[1:] or ["dyn", "noise", "noise_aos", "pdf", "pu"]
    print(f"platform={jax.devices()[0].platform} N=2^20 pu decomposition "
          f"k={K_LO}..{K_HI}", flush=True)
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
        print(f"{leg:10s} T({K_LO})={t_lo:8.3f}  T({K_HI})={t_hi:8.3f}  "
              f"slope={(t_hi - t_lo) / (K_HI - K_LO):7.3f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
