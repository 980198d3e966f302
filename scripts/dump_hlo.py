"""Dump compiled-HLO op summaries for the fast (microbench) and slow
(pf_core.resample) resample graphs to find the structural difference."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gpu_se_tpu.filters import particle as pf_core
from gpu_se_tpu.filters.particle import PFState
from gpu_se_tpu.filters.resampling import (
    sorted_row_gather,
    systematic_resample_indices,
)

N = 2 ** 20


def fast_fn(parts, weights, r):
    idx = jax.lax.optimization_barrier(systematic_resample_indices(weights, r))
    return sorted_row_gather(parts, idx)


def slow_fn(state):
    return pf_core.resample(state)


def summarize(name, hlo_text):
    print(f"===== {name} =====")
    interesting = re.findall(
        r"^\s*(\S+ = \S+ (?:gather|scatter|while|sort|fusion|custom-call|"
        r"dynamic-slice|dynamic-update-slice|all-)[^\n]*)",
        hlo_text,
        re.M,
    )
    for line in interesting:
        print(line[:220])
    print(f"({len(hlo_text)} chars total)\n")


def main():
    parts = jnp.zeros((N, 5), jnp.float32)
    w = jnp.ones((N,), jnp.float32)
    r = jnp.float32(0.3)
    state = PFState(particles=parts, weights=w, key=jax.random.PRNGKey(0))

    c1 = jax.jit(fast_fn).lower(parts, w, r).compile()
    summarize("fast (microbench B)", c1.as_text())
    c2 = jax.jit(slow_fn).lower(state).compile()
    summarize("slow (pf_core.resample)", c2.as_text())


if __name__ == "__main__":
    main()
