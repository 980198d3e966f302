"""k-chain slope of the round-5 TILED-STATE full PF step at 2^20 vs the
round-4 untiled production step (method of record, CLAUDE.md item 4:
one jit running k data-dependent steps, slope = (T(9)-T(1))/8, ends in
a scalar fetched with float(); fresh wall-clock-seeded inputs per call
defeat the relay replay cache).

Legs: tiled | untiled (both the full bench rig: bioreactor predict +
mixture update + resample in the production degenerate regime).

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_tiled.py [legs...]
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

from gpu_se_tpu.distributions import GaussianSum  # noqa: E402
from gpu_se_tpu.filters import particle as pf_core  # noqa: E402
from gpu_se_tpu.filters import particle_tiled as pft  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402

N = 2 ** 20
CALLS = 12
K_LO, K_HI = 1, 9

X_SS = np.array([280 / 180, 640 / 24.6, 1000 / 116, 0.0, 0.0])


def rig():
    x0 = GaussianSum.create(
        np.stack([X_SS, X_SS]),
        np.stack([np.eye(5) * 1e-4, np.eye(5) * 1e-3]),
        np.array([0.75, 0.25]),
    )
    state_pdf = GaussianSum.create(
        np.zeros((2, 5)),
        np.stack([
            np.diag([1e-4, 1e-7, 1e-3, 1e-3, 1e-7]),
            np.diag([1e-3, 1e-6, 1e-2, 1e-2, 1e-6]),
        ]),
        np.array([0.75, 0.25]),
    )
    meas_pdf = GaussianSum.create(
        np.array([[1e-1, 0], [0, -1e-1]]),
        np.array([[[6e-2, 0], [0, 8e-2]], [[500, 100], [100, 700]]]),
        np.array([0.85, 0.15]),
    )
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(X_SS, np.asarray(u), xp=np),
                    jnp.float32)
    return x0, state_pdf, meas_pdf, u, z


def chain_tiled(k, x0, state_pdf, meas_pdf, u, z, block=4096, ctps=32):
    f = functools.partial(bio.homeostatic_des, xp=jnp)
    g = functools.partial(bio.static_outputs, xp=jnp)

    @jax.jit
    def run(tiled0, seed):
        st = pft.TiledPFState(
            tiled=tiled0 + 1e-9 * seed, key=jax.random.PRNGKey(
                seed.astype(jnp.int32)))
        for _ in range(k):
            st = pft.step(st, u, z, jnp.float32(0.1), f, g,
                          state_pdf, meas_pdf, block=block,
                          compact_tps=ctps)
        return jnp.sum(st.tiled[:, :640], dtype=jnp.float32)

    return run


def chain_untiled(k, x0, state_pdf, meas_pdf, u, z):
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs

    @jax.jit
    def run(parts0, seed):
        st = pf_core.PFState(
            particles=parts0 + 1e-9 * seed,
            weights=jnp.full((N,), 1.0 / N, jnp.float32),
            key=jax.random.PRNGKey(seed.astype(jnp.int32)))
        for _ in range(k):
            st = pf_core.step(st, u, z, jnp.float32(0.1), f, g,
                              state_pdf, meas_pdf)
        return jnp.sum(st.particles, dtype=jnp.float32)

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
    legs = sys.argv[1:] or ["tiled", "untiled"]
    print(f"platform={jax.devices()[0].platform} N=2^20 full step "
          f"k={K_LO}..{K_HI}", flush=True)
    rng = np.random.default_rng(int(time.time() * 1000) % 2 ** 31)
    x0, state_pdf, meas_pdf, u, z = rig()
    parts0 = x0.draw(jax.random.PRNGKey(
        int(time.time() * 997) % 2**31), (N,))
    tiled0 = pft.tile(parts0, jax.random.PRNGKey(0)).tiled
    jax.block_until_ready(tiled0)
    for leg in legs:
        if leg.startswith("tiled"):
            block = 8192 if "b8192" in leg else 4096
            ctps = 64 if "c64" in leg else 32
            mk = functools.partial(chain_tiled, block=block, ctps=ctps)
            arg0 = tiled0
        else:
            mk, arg0 = chain_untiled, parts0
        t_lo = measure(mk(K_LO, x0, state_pdf, meas_pdf, u, z), arg0, rng)
        t_hi = measure(mk(K_HI, x0, state_pdf, meas_pdf, u, z), arg0, rng)
        slope = (t_hi - t_lo) / (K_HI - K_LO)
        print(f"{leg:9s} T({K_LO})={t_lo:8.3f}  T({K_HI})={t_hi:8.3f}  "
              f"slope={slope:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
