"""GSUKF fusion-pathology probe (round-2 continuation).

Committed probes (probe_gsf_stages.out) show: update standalone ~4 ms,
predict standalone ~1.3 ms, but predict+update FUSED ~28 ms at 2^16.
Hypothesis: the unrolled cholesky_small in update's get_sigma_points
reads each covariance element as a separate slice; XLA's producer fusion
duplicates the entire predict chain (the (N,11,5) unscented einsums)
into each read -> ~15x recompute. An optimization_barrier on the
covariances entering the Cholesky should force one materialization.

Measurement: fresh host-random perturbation per call (defeats the relay
cache), in-jit scalar reduction fetched with float() (forces completion),
null-workload calibration subtracted.
"""
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

from gpu_se_tpu.filters import gs_ukf  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402
from results._filter_bench import rig_dists  # noqa: E402

N = 2 ** 16
CALLS = 7


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    dt = jnp.float32(0.1)

    seed = int(time.time() * 1000) % (2 ** 31)
    state = gs_ukf.init(jax.random.PRNGKey(seed), N, x0, state_pdf)
    # one real predict so covariances are realistic (not the repeated init cov)
    state = jax.jit(lambda s: gs_ukf.predict(s, u, dt, f, state_pdf))(state)
    jax.block_until_ready(state.means)

    def reduce_state(s):
        return (
            jnp.sum(s.means, dtype=jnp.float32)
            + jnp.sum(s.covariances, dtype=jnp.float32)
            + jnp.sum(s.weights, dtype=jnp.float32)
        )

    def perturb(s, eps):
        return s.replace(means=s.means + eps * 1e-9)

    @jax.jit
    def v_null(s, eps):
        return jnp.sum(perturb(s, eps).means, dtype=jnp.float32)

    @jax.jit
    def v_pred(s, eps):
        s2 = gs_ukf.predict(perturb(s, eps), u, dt, f, state_pdf)
        return reduce_state(s2)

    @jax.jit
    def v_upd(s, eps):
        s2 = gs_ukf.update(perturb(s, eps), u, z, g, meas_pdf)
        return reduce_state(s2)

    @jax.jit
    def v_pu(s, eps):
        s2 = gs_ukf.predict(perturb(s, eps), u, dt, f, state_pdf)
        s3 = gs_ukf.update(s2, u, z, g, meas_pdf)
        return reduce_state(s3)

    @jax.jit
    def v_pu_barrier(s, eps):
        s2 = gs_ukf.predict(perturb(s, eps), u, dt, f, state_pdf)
        m, c = jax.lax.optimization_barrier((s2.means, s2.covariances))
        s3 = gs_ukf.update(s2.replace(means=m, covariances=c), u, z, g, meas_pdf)
        return reduce_state(s3)

    @jax.jit
    def v_step(s, eps):
        s2 = gs_ukf.step(perturb(s, eps), u, z, dt, f, g, state_pdf, meas_pdf)
        return reduce_state(s2)

    @jax.jit
    def v_step_barrier(s, eps):
        s2 = gs_ukf.predict(perturb(s, eps), u, dt, f, state_pdf)
        m, c = jax.lax.optimization_barrier((s2.means, s2.covariances))
        s3 = gs_ukf.update(s2.replace(means=m, covariances=c), u, z, g, meas_pdf)
        m, c = jax.lax.optimization_barrier((s3.means, s3.covariances))
        s4 = gs_ukf.resample(s3.replace(means=m, covariances=c))
        return reduce_state(s4)

    rng = np.random.default_rng(seed ^ 0x5EED)

    def measure(name, fn):
        # compile + warm
        float(fn(state, jnp.float32(rng.standard_normal())))
        times = []
        for _ in range(CALLS):
            eps = jnp.float32(rng.standard_normal())
            t0 = time.perf_counter()
            float(fn(state, eps))
            times.append((time.perf_counter() - t0) * 1e3)
        med = float(np.median(times))
        print(f"{name:24s} median {med:8.2f} ms", flush=True)
        return med

    null = measure("null", v_null)
    for name, fn in [
        ("predict", v_pred),
        ("update", v_upd),
        ("pred+upd FUSED", v_pu),
        ("pred+upd BARRIER", v_pu_barrier),
        ("full step FUSED", v_step),
        ("full step BARRIER", v_step_barrier),
    ]:
        med = measure(name, fn)
        print(f"  -> net {med - null:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
