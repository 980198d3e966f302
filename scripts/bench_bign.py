"""Big-N single-chip bench artifact: full PF step throughput at
2^20..2^24 (the reference's GTX-1070 regime: run-seqs to 2^23.5,
construction+steps at 2^24). Round 3's ">=2^23 remote AOT compile
hangs" no longer reproduces with the v4 resample as the default
(ATTEMPT_2E23.json: full fused step compiles in ~8 s and runs).

Writes results/artifacts/BIGN_BENCH.json. Methodology: wall-clock-seeded
chained loop, one final block (relay backpressure ~= device time).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import functools  # noqa: E402

from gpu_se_tpu.filters import particle_tiled as pft  # noqa: E402
from results._filter_bench import rig_dists  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402

REPS = 20


def main():
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    # round 5: the tiled-state production step (filters/particle_tiled)
    f = functools.partial(bio.homeostatic_des, xp=jnp)
    g = functools.partial(bio.static_outputs, xp=jnp)
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    seed = int(time.time() * 1000) % (2 ** 31)

    art = {"seed": seed, "reps": REPS, "points": {}}
    for logn in (20, 21, 22, 23, 24):
        n = 2 ** logn

        @jax.jit
        def step(s):
            return pft.step(s, u, z, jnp.float32(0.1), f, g,
                            state_pdf, meas_pdf)

        state = pft.init(jax.random.PRNGKey(seed + logn), n, x0)
        t0 = time.time()
        state = step(state)
        jax.block_until_ready(state.tiled)
        compile_s = time.time() - t0

        t0 = time.perf_counter()
        for _ in range(REPS):
            state = step(state)
        jax.block_until_ready(state.tiled)
        dt = (time.perf_counter() - t0) / REPS
        art["points"][f"2^{logn}"] = {
            "steps_per_s": round(1.0 / dt, 2),
            "ms_per_step": round(dt * 1e3, 3),
            "compile_s": round(compile_s, 1),
        }
        print(f"2^{logn}: {1.0 / dt:.1f} steps/s ({dt * 1e3:.2f} ms)",
              flush=True)
        del state

    with open("/root/repo/results/artifacts/BIGN_BENCH.json", "w") as fh:
        json.dump(art, fh, indent=1)
    print(json.dumps(art), flush=True)


if __name__ == "__main__":
    main()
