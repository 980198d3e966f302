"""Dump FULL compiled HLO of the fused PF step (slow) and the standalone
resample (fast) to files for layout/fusion diffing."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpu_se_tpu.filters import particle as pf_core
from gpu_se_tpu.filters.resampling import (
    sorted_row_gather,
    systematic_resample_indices,
)
from results._filter_bench import rig_dists
from gpu_se_tpu.models import bioreactor as bio

N = 2 ** 20
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts", "hlo")


def main():
    os.makedirs(OUT, exist_ok=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    dt_ = jnp.float32(0.1)

    def fused(s):
        s = pf_core.predict(s, u, dt_, f, state_pdf)
        s = pf_core.update(s, u, z, g, meas_pdf)
        key, sub = jax.random.split(s.key)
        r = jax.random.uniform(sub, ())
        idx = jax.lax.optimization_barrier(systematic_resample_indices(s.weights, r))
        parts = sorted_row_gather(s.particles, idx)
        w = jnp.full((N,), 1.0 / N, jnp.float32)
        return pf_core.PFState(particles=parts, weights=w, key=key)

    def standalone(parts, weights, r):
        idx = jax.lax.optimization_barrier(systematic_resample_indices(weights, r))
        return sorted_row_gather(parts, idx)

    state = pf_core.init(jax.random.PRNGKey(0), N, x0)
    c1 = jax.jit(fused).lower(state).compile()
    with open(os.path.join(OUT, "fused.hlo"), "w") as fh:
        fh.write(c1.as_text())
    parts = jnp.zeros((N, 5), jnp.float32)
    w = jnp.ones((N,), jnp.float32)
    c2 = jax.jit(standalone).lower(parts, w, jnp.float32(0.3)).compile()
    with open(os.path.join(OUT, "standalone.hlo"), "w") as fh:
        fh.write(c2.as_text())
    print("written", OUT)


if __name__ == "__main__":
    main()
