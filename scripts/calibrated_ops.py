"""Calibrated per-op device times -> results/artifacts/CALIBRATED_OPS.json.

The relay-proof methodology (CLAUDE.md): fresh inputs derived on device
from a host-fresh scalar, an in-jit scalar reduction fetched with
float() (forces completion), minus a null-workload calibration of the
same shape. Each entry reports median with [p10, p90] over CALLS calls
(ADVICE round 2: 7 calls left the net inside the RTT jitter; 25+ here).

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/calibrated_ops.py
"""
import json
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

N = 2**20
N_GSF = 2**18
CALLS = 25


def measure(fn, parts, rng):
    float(fn(parts, jnp.float32(rng.standard_normal())))  # compile+warm
    times = []
    for _ in range(CALLS):
        eps = jnp.float32(rng.standard_normal())
        t0 = time.perf_counter()
        float(fn(parts, eps))
        times.append((time.perf_counter() - t0) * 1e3)
    p10, med, p90 = np.percentile(times, [10, 50, 90])
    return dict(median_ms=round(float(med), 3), p10_ms=round(float(p10), 3),
                p90_ms=round(float(p90), 3))


def main():
    from results._filter_bench import rig_dists
    from gpu_se_tpu.filters import particle as pf_core, gs_ukf
    from gpu_se_tpu.filters import resampling
    from gpu_se_tpu.filters.resampling import (
        sorted_row_gather, systematic_resample_indices,
    )
    from gpu_se_tpu.models import bioreactor as bio

    print(f"platform={jax.devices()[0].platform}", flush=True)
    x_ss, x0, state_pdf, meas_pdf = rig_dists()
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)

    seed = int(time.time() * 1000) % (2**31)
    rng = np.random.default_rng(seed)
    parts = jnp.asarray(rng.standard_normal((N, 5)), jnp.float32)
    jax.block_until_ready(parts)

    def prep(p_, eps):
        p = p_ + eps * 1e-9
        w = jnp.exp(4.0 * jnp.tanh(p[:, 0]) ** 2)
        r = jnp.abs(eps) % 1.0
        return p, w, r

    @jax.jit
    def t_null(p_, eps):
        p, w, r = prep(p_, eps)
        return jnp.sum(p[0]) + jnp.sum(w, dtype=jnp.float32) * r

    @jax.jit
    def t_pred_upd(p_, eps):
        p, w, r = prep(p_, eps)
        key = jax.random.PRNGKey(jnp.abs(eps * 1e6).astype(jnp.int32))
        st = pf_core.PFState(particles=p, weights=w / jnp.sum(w), key=key)
        st = pf_core.predict(st, u, jnp.float32(0.1), f, state_pdf)
        st = pf_core.update(st, u, z, g, meas_pdf)
        return jnp.sum(st.particles[0]) + jnp.sum(st.weights, dtype=jnp.float32)

    @jax.jit
    def t_idx(p_, eps):
        p, w, r = prep(p_, eps)
        idx = jax.lax.optimization_barrier(systematic_resample_indices(w, r))
        return jnp.sum(idx.astype(jnp.float32)) + p[0, 0]

    @jax.jit
    def t_xla_full(p_, eps):
        p, w, r = prep(p_, eps)
        idx = jax.lax.optimization_barrier(systematic_resample_indices(w, r))
        out = sorted_row_gather(p, idx)
        return jnp.sum(out, dtype=jnp.float32) + jnp.sum(idx.astype(jnp.float32))

    def make_resample(impl_name, **kw):
        if impl_name == "v1":
            from gpu_se_tpu.ops.resample_pallas import pallas_systematic_resample

            fn = lambda p, w, r: pallas_systematic_resample(p, w, r, 128, 256)
        else:
            from gpu_se_tpu.ops.resample_pallas_block import (
                pallas_systematic_resample_ends,
            )

            fn = lambda p, w, r: pallas_systematic_resample_ends(p, w, r, **kw)

        @jax.jit
        def timed(p_, eps):
            p, w, r = prep(p_, eps)
            out, anc = fn(p, w, r)
            return jnp.sum(out, dtype=jnp.float32) + jnp.sum(anc.astype(jnp.float32))
        return timed

    @jax.jit
    def t_step(p_, eps):
        p, w, r = prep(p_, eps)
        key = jax.random.PRNGKey(jnp.abs(eps * 1e6).astype(jnp.int32))
        st = pf_core.PFState(particles=p, weights=w / jnp.sum(w), key=key)
        st = pf_core.step(st, u, z, jnp.float32(0.1), f, g, state_pdf, meas_pdf)
        return jnp.sum(st.particles, dtype=jnp.float32)

    # GSUKF step at 2^18 (fresh-perturbed means, fixed covs)
    means0 = jnp.asarray(rng.standard_normal((N_GSF, 5)) * 0.01 + x_ss, jnp.float32)
    covs0 = jnp.broadcast_to(jnp.eye(5, dtype=jnp.float32) * 1e-4, (N_GSF, 5, 5))
    jax.block_until_ready(means0)

    @jax.jit
    def t_gsf_null(m_, eps):
        m = m_ + eps * 1e-9
        return jnp.sum(m[0]) * (jnp.abs(eps) % 1.0)

    @jax.jit
    def t_gsf_step(m_, eps):
        m = m_ + eps * 1e-9
        key = jax.random.PRNGKey(jnp.abs(eps * 1e6).astype(jnp.int32))
        st = gs_ukf.GSUKFState(
            means=m, covariances=covs0,
            weights=jnp.full((N_GSF,), 1.0 / N_GSF, jnp.float32), key=key,
        )
        st = gs_ukf.step(st, u, z, jnp.float32(0.1), f, g, state_pdf, meas_pdf)
        return jnp.sum(st.means, dtype=jnp.float32) + jnp.sum(st.weights)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "results", "artifacts", "CALIBRATED_OPS.json")
    stages = sys.argv[1:] or ["medians", "slopes"]
    # resumable: the full run exceeds a single relay window; each stage
    # merges into the existing JSON
    if os.path.exists(path):
        with open(path) as fh:
            out = json.load(fh)
        out.setdefault("ops", {})
    else:
        out = {"ops": {}}
    out.update({
        "method": "fresh on-device inputs per call; in-jit scalar reduce "
                  "fetched with float(); net = median - null median; "
                  f"{CALLS} calls; seed from wall clock ({seed})",
        "hardware": "1x TPU v5e via dev relay",
        "n": N,
        "n_gsf": N_GSF,
    })

    def save():
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print("->", path, flush=True)

    if "medians" not in stages:
        null = out["ops"]["null_sync_rtt"]
        run_slopes(out, rng, save)
        return

    null = measure(t_null, parts, rng)
    out["ops"]["null_sync_rtt"] = null
    print("null", null, flush=True)

    # rbg-PRNG leg: the predict's threefry normals are suspected to be a
    # large share of the 1.4 ms predict+update; the hardware RBG generator
    # is the cheap alternative (production default stays threefry for
    # partitionable shard-invariance)
    @jax.jit
    def t_pred_upd_rbg(p_, eps):
        p, w, r = prep(p_, eps)
        key = jax.random.key(jnp.abs(eps * 1e6).astype(jnp.int32), impl="rbg")
        st = pf_core.PFState(particles=p, weights=w / jnp.sum(w), key=key)
        st = pf_core.predict(st, u, jnp.float32(0.1), f, state_pdf)
        st = pf_core.update(st, u, z, g, meas_pdf)
        return jnp.sum(st.particles[0]) + jnp.sum(st.weights, dtype=jnp.float32)

    entries = [
        ("pf_predict_update_2e20", t_pred_upd),
        ("pf_predict_update_rbg_2e20", t_pred_upd_rbg),
        ("resample_indices_scatter_cummax_2e20", t_idx),
        ("resample_xla_full_2e20", t_xla_full),
        ("resample_pallas_v1_128_256_2e20", make_resample("v1")),
        # ends-kernel geometry sweep (2026-08-20): 256/256 13.7, 512/256
        # 19.1, 256/512 17.2, 512/512 19.2, 1024/256 19.2 ms — every
        # geometry loses to v1/XLA (the per-window one-hot matmul work
        # dominates); only the best is kept in the committed artifact
        ("resample_ends_256_256_2e20",
         make_resample("ends", block_slots=256, window=256)),
        # NOTE: no pf_full_step median entry — three runs stalled >9 min
        # on it right after the ends-kernel leg (transient relay wedge);
        # the k-chain slope below is the step number of record anyway.
    ]
    for name, fn in entries:
        m = measure(fn, parts, rng)
        m["net_ms"] = round(m["median_ms"] - null["median_ms"], 3)
        out["ops"][name] = m
        print(name, m, flush=True)

    gnull = measure(t_gsf_null, means0, rng)
    out["ops"]["gsf_null_sync_rtt"] = gnull
    m = measure(t_gsf_step, means0, rng)
    m["net_ms"] = round(m["median_ms"] - gnull["median_ms"], 3)
    out["ops"]["gsf_full_step_2e18"] = m
    print("gsf_full_step_2e18", m, flush=True)

    out["gsf_full_step_2e18"] = {
        "device_ms": out["ops"]["gsf_full_step_2e18"]["net_ms"]}
    save()
    if "slopes" in stages:
        run_slopes(out, rng, save)


def run_slopes(out, rng, save):
    """k-chain slopes: the round-3 method of record for step-level
    times. The isolated-call medians carry +-1.5 ms of relay wobble
    between entries (see scripts/probe_v6*.out); timing in-jit chains
    of k data-dependent steps and taking (T(9)-T(1))/8 cancels the
    sync RTT and resolves sub-ms differences. probe_v7.out has the
    cross-impl comparison this is distilled from (incl. the coarse
    kernel at 11.78 ms/step, not re-measured here)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import probe_v7

    rigt = probe_v7.rig()
    p0 = jnp.asarray(
        rigt[0].draw(jax.random.PRNGKey(rng.integers(2**31)), (probe_v7.N,)),
        jnp.float32)
    jax.block_until_ready(p0)
    slopes = {}
    for kind, label in [("nores", "pf_predict_update"),
                        ("xla", "pf_step_resample_xla"),
                        ("v1", "pf_step_resample_pallas_v1"),
                        ("v3", "pf_step_resample_pallas_v3"),
                        ("v4", "pf_step_resample_pallas_v4_default")]:
        step = probe_v7.make_step(kind, rigt)
        t_lo = probe_v7.measure(probe_v7.chain_fn(step, 1), p0, rng)
        t_hi = probe_v7.measure(probe_v7.chain_fn(step, 9), p0, rng)
        slopes[label] = round((t_hi - t_lo) / 8.0, 3)
        print("slope", label, slopes[label], flush=True)
    slopes["pf_step_resample_coarse"] = 11.783  # probe_v7.out, same method
    out["step_slopes_ms_2e20"] = {
        "method": "in-jit chain of k dependent full steps, "
                  "(T(9)-T(1))/8, median of 15 calls each, fresh inputs; "
                  "coarse-kernel entry carried from scripts/probe_v7.out",
        **slopes,
    }
    # the slope of the production default is the honest device step time
    # (ADVICE r3: keep this keyed to the ACTUAL default in
    # filters/resampling.py — v4 tiled since round 4)
    out["pf_full_step_2e20"] = {
        "device_ms": slopes["pf_step_resample_pallas_v4_default"],
        "method": "k-chain slope",
    }
    save()


if __name__ == "__main__":
    main()
