"""Round-5 a2a distributed-resample protocol: correctness probe.

Compares make_shard_map_step(resample_impl=...) outputs bitwise across
{xla ring, a2a_ring, a2a_ring_v4} and across mesh widths on the virtual
CPU mesh, for benign and hyper-degenerate weight regimes.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gpu_se_tpu.filters.particle import PFState
from gpu_se_tpu.parallel import sharded
from gpu_se_tpu.distributions import GaussianSum


def parts_and_noise(nx=5):
    def f(x, u, dt):
        return (0.1 * u[0] - 0.01 * x) * dt

    def g(x, u):
        return x[:2] * 1.0

    state_pdf = GaussianSum.create(
        means=np.zeros((2, nx)),
        covariances=np.stack([np.eye(nx) * 1e-2, np.eye(nx) * 1e-1]),
        weights=np.array([0.5, 0.5]),
    )
    # tight measurement pdf => hyper-degenerate posterior weights
    measurement_pdf = GaussianSum.create(
        means=np.zeros((1, 2)),
        covariances=np.array([np.eye(2) * 1e-4]),
        weights=np.array([1.0]),
    )
    return f, g, state_pdf, measurement_pdf


def run(impl, width, n, seed=0):
    f, g, state_pdf, measurement_pdf = parts_and_noise()
    mesh = Mesh(np.array(jax.devices()[:width]), (sharded.PARTICLE_AXIS,))
    step = sharded.make_shard_map_step(mesh, f, g, resample_impl=impl)
    key = jax.random.PRNGKey(seed)
    particles = jax.random.normal(jax.random.PRNGKey(7), (n, 5))
    weights = jnp.ones((n,)) / n
    state = sharded.shard_pf_state(
        PFState(particles=particles, weights=weights, key=key), mesh)
    u = jnp.array([1.0])
    z = jnp.array([0.3, -0.2])
    out = step(state, u, z, 0.1, state_pdf, measurement_pdf)
    return np.asarray(out.particles), np.asarray(out.weights)


def main():
    n = 2**15
    base_p, base_w = run("xla", 1, n)
    fails = 0
    for impl in ("a2a_ring", "a2a_ring_v4"):
        for width in (1, 2, 4, 8):
            if impl == "a2a_ring_v4" and (n // width) % 4096 != 0:
                continue
            p, w = run(impl, width, n)
            ok = np.array_equal(p, base_p) and np.allclose(w, base_w)
            print(f"{impl:14s} W={width}: {'OK' if ok else 'MISMATCH'}")
            if not ok:
                fails += 1
                d = np.nonzero(~(p == base_p).all(axis=1))[0]
                print("  first diff rows:", d[:5], "of", d.size)
    # ring-xla reference across widths too
    for width in (2, 4, 8):
        p, w = run("xla", width, n)
        ok = np.array_equal(p, base_p)
        print(f"{'xla':14s} W={width}: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            fails += 1
    print("FAILS:", fails)
    return fails


if __name__ == "__main__":
    raise SystemExit(main())
