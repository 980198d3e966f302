"""A pacf-passing accelerator timing series (VERDICT r4 missing #3).

The reference gates every run sequence on max |pacf| < 0.2
(/root/reference/results/pf_openloop/pf_run_seq.py:373-413). The
round 2-4 TPU run sequences at N >= 2^19 read 0.7-0.9 through the
relay because successive NON-blocking calls share the relay queue
(each call's wall time depends on how much of its predecessor is still
queued). This script removes that coupling structurally: each rep is
ONE fully-blocking jitted call executing a K-step data-dependent chain
of the production tiled PF step, fresh-seeded from the wall clock, with
a scalar fetched via float() (forces completion, CLAUDE.md). Reps
therefore share no queue state; what remains is the relay's slow RTT
drift, which the pacf measures honestly.

Writes results/artifacts/PACF_SERIES.json.

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/pacf_series.py
"""
import functools
import json
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
from gpu_se_tpu.utils import max_abs_pacf  # noqa: E402
from scripts.probe_tiled import rig  # noqa: E402

N = 2 ** 20
K = 8
REPS = 100


def main():
    print(f"platform={jax.devices()[0].platform} N=2^20 K={K} "
          f"reps={REPS}", flush=True)
    rng = np.random.default_rng(int(time.time() * 1000) % 2 ** 31)
    x0, state_pdf, meas_pdf, u, z = rig()
    f = functools.partial(bio.homeostatic_des, xp=jnp)
    g = functools.partial(bio.static_outputs, xp=jnp)

    @jax.jit
    def chain(tiled0, seed):
        st = pft.TiledPFState(
            tiled=tiled0 + 1e-9 * seed,
            key=jax.random.PRNGKey(seed.astype(jnp.int32)))
        for _ in range(K):
            st = pft.step(st, u, z, jnp.float32(0.1), f, g,
                          state_pdf, meas_pdf)
        return jnp.sum(st.tiled[:, :640], dtype=jnp.float32)

    @jax.jit
    def null(seed):
        return jnp.sum(seed * jnp.ones((8,), jnp.float32))

    parts0 = x0.draw(jax.random.PRNGKey(
        int(time.time() * 997) % 2**31), (N,))
    tiled0 = pft.tile(parts0, jax.random.PRNGKey(0)).tiled
    jax.block_until_ready(tiled0)

    # warm-up (compile both)
    float(chain(tiled0, jnp.float32(rng.standard_normal())))
    float(null(jnp.float32(rng.standard_normal())))

    nulls = []
    for _ in range(30):
        s = jnp.float32(rng.standard_normal())
        t0 = time.perf_counter()
        float(null(s))
        nulls.append((time.perf_counter() - t0) * 1e3)
    null_ms = float(np.median(nulls))

    series = []
    for _ in range(REPS):
        seed = jnp.float32(abs(rng.standard_normal()) * 1e4)
        t0 = time.perf_counter()
        float(chain(tiled0, seed))
        series.append((time.perf_counter() - t0) * 1e3)
    series = np.asarray(series)

    pacf = float(max_abs_pacf(series / 1e3))
    med = float(np.median(series))
    out = {
        "metric": "per-rep wall time of a K-step blocking tiled-PF chain",
        "n": N, "k_steps": K, "reps": REPS,
        "null_sync_ms": round(null_ms, 3),
        "median_rep_ms": round(med, 3),
        "per_step_ms_est": round((med - null_ms) / K, 3),
        "max_abs_pacf": round(pacf, 4),
        "reference_gate": "max |pacf| < 0.2 (pf_run_seq.py:373-413)",
        "gate_passed": bool(pacf < 0.2),
        "series_ms": [round(float(t), 2) for t in series],
        "method": (
            "each rep is one fully-blocking jit call (K data-dependent "
            "steps, wall-clock-seeded, float() scalar fetch); reps share "
            "no relay queue state, unlike the round 2-4 non-blocking "
            "run-seqs whose pacf 0.7-0.9 measured queue coupling"
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "artifacts", "PACF_SERIES.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"median={med:.2f} ms  null={null_ms:.2f}  "
          f"per-step~{(med - null_ms) / K:.3f} ms  "
          f"max|pacf|={pacf:.4f}  gate_passed={pacf < 0.2}", flush=True)


if __name__ == "__main__":
    main()
