"""Incremental TPU validation ladder — run after relay recovery or before
handing the repo to the driver's bench.

Each rung compiles a strictly larger program; a hang is caught at the
smallest offending size instead of wedging the relay with the full
benchmark. Usage:

    env PYTHONPATH=/root/repo:/root/.axon_site timeout 500 python scripts/validate_tpu.py
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from gpu_se_tpu.distributions import GaussianSum  # noqa: E402
from gpu_se_tpu.filters import particle as pf_core  # noqa: E402
from gpu_se_tpu.filters.resampling import systematic_resample  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402


def rung(name):
    print(f"--- {name}", flush=True)


def main():
    rung("0: trivial op")
    print(int(jnp.arange(4).sum()), flush=True)

    rung("1: standalone resample 2^14")
    key = jax.random.PRNGKey(0)
    parts = jax.random.normal(key, (2**14, 5))
    w = jax.random.uniform(key, (2**14,)) + 1e-6
    f = jax.jit(lambda p, w, k: systematic_resample(p, w, k))
    out, _ = f(parts, w, key)
    jax.block_until_ready(out)
    print("ok", flush=True)

    x_ss = np.array([280 / 180, 640 / 24.6, 1000 / 116, 0.0, 0.0])
    x0 = GaussianSum.create(
        np.stack([x_ss, x_ss]), np.stack([np.eye(5) * 1e-4, np.eye(5) * 1e-3]),
        np.array([0.75, 0.25]),
    )
    state_pdf = GaussianSum.create(
        np.zeros((2, 5)),
        np.stack([np.diag([1e-4, 1e-7, 1e-3, 1e-3, 1e-7]),
                  np.diag([1e-3, 1e-6, 1e-2, 1e-2, 1e-6])]),
        np.array([0.75, 0.25]),
    )
    meas_pdf = GaussianSum.create(
        np.array([[1e-1, 0], [0, -1e-1]]),
        np.array([[[6e-2, 0], [0, 8e-2]], [[500, 100], [100, 700]]]),
        np.array([0.85, 0.15]),
    )
    fdyn = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)

    for logn in (14, 18, 20):
        rung(f"2: fused PF step 2^{logn}")
        n = 2**logn
        state = pf_core.init(jax.random.PRNGKey(0), n, x0)
        step = jax.jit(
            lambda s: pf_core.step(s, u, z, jnp.float32(0.1), fdyn, g,
                                   state_pdf, meas_pdf)
        )
        t0 = time.time()
        s = step(state)
        jax.block_until_ready(s.particles)
        print(f"compile+first {time.time()-t0:.1f} s", flush=True)
        t0 = time.perf_counter()
        for _ in range(20):
            s = step(s)
        jax.block_until_ready(s.particles)
        dt = (time.perf_counter() - t0) / 20
        print(f"steady {dt*1000:.2f} ms/step ({1/dt:.1f} steps/s)", flush=True)
        est = np.asarray(pf_core.point_estimate(s))
        assert np.isfinite(est).all()

    print("ALL RUNGS PASSED", flush=True)


if __name__ == "__main__":
    main()
