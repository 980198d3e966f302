"""Decompose the GSUKF nores slope at 2^18 (still ~10.5 ms after the
lanes-layout refactor): noise draw vs predict_core vs update_core.

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/probe_gsf2.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gpu_se_tpu.filters import gs_ukf
from gpu_se_tpu.models import bioreactor as bio
from results._filter_bench import rig_dists

N = 2 ** 18
K_LO, K_HI, CALLS = 1, 9, 10

x_ss, x0, state_pdf, meas_pdf = rig_dists()
f = bio.Bioreactor.homeostatic_DEs
g = bio.Bioreactor.static_outputs
u = jnp.array([0.06, 0.2])
z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)


def make(leg, k):
    @jax.jit
    def run(m0, eps):
        means = m0 + eps * 1e-9
        covs = jnp.broadcast_to(
            jnp.eye(5, dtype=jnp.float32)[None] * 1e-4, (N, 5, 5)
        ) + means[:, :, None] * 0.0
        w = jnp.full((N,), 1.0 / N, jnp.float32)
        key = jax.random.PRNGKey(jnp.abs(eps * 1e6).astype(jnp.int32))
        acc = jnp.float32(0.0)
        for i in range(k):
            key, sub = jax.random.split(key)
            if leg == "noise":
                noise = state_pdf.draw(sub, (N, 11))
                means = means + 1e-9 * noise[:, 0, :]
            elif leg == "noise_t":
                nt = state_pdf.draw_t(sub, N * 11)
                means = means + 1e-9 * jnp.sum(nt)
            elif leg == "normals":
                eps = jax.random.normal(sub, (5, N * 11), jnp.float32)
                means = means + 1e-9 * jnp.sum(eps)
            elif leg == "bits":
                b = jax.random.bits(sub, (5, N * 11), jnp.uint32)
                means = means + 1e-9 * jnp.sum(b.astype(jnp.float32))
            elif leg == "categorical":
                c = jax.random.categorical(
                    sub, jnp.log(state_pdf.weights), shape=(N * 11,))
                means = means + 1e-9 * jnp.sum(c.astype(jnp.float32))
            elif leg == "predict":
                noise = jnp.zeros((N, 11, 5), jnp.float32) + means[:, None, :] * 1e-12
                means, covs = gs_ukf.predict_core(means, covs, u, 0.1, noise, f)
                covs = covs + 1e-6 * jnp.eye(5, dtype=jnp.float32)
            elif leg == "update":
                means, covs, w = gs_ukf.update_core(
                    means, covs, w, u, z, g, meas_pdf)
                covs = covs + 1e-6 * jnp.eye(5, dtype=jnp.float32)
            elif leg == "updpdf":
                # the weight-pdf piece of update_core alone
                yv = jax.vmap(g, in_axes=(1, None), out_axes=1)(means.T, u)
                w = w * meas_pdf.pdf((z[:, None] - yv).T)
                means = means + 1e-9 * jnp.sum(w)
            elif leg == "updsig":
                # sigma + eta propagation piece alone
                st = gs_ukf._sigma_points_lanes(
                    means.T, jnp.transpose(covs, (1, 2, 0)))
                inner_g = jax.vmap(g, in_axes=(1, None), out_axes=1)
                etas = jax.vmap(inner_g, in_axes=(0, None), out_axes=0)(st, u)
                means = means + 1e-9 * (jnp.sum(etas) + jnp.sum(st))
            elif leg == "sigma":
                st = gs_ukf._sigma_points_lanes(
                    means.T, jnp.transpose(covs, (1, 2, 0)))
                means = means + 1e-9 * st[0].T
        return jnp.sum(means) + jnp.sum(covs) * 0 + jnp.sum(w) * 0

    return run


def measure(fn, m0, rng):
    float(fn(m0, jnp.float32(rng.standard_normal())))
    ts = []
    for _ in range(CALLS):
        t0 = time.perf_counter()
        float(fn(m0, jnp.float32(rng.standard_normal())))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    print(f"platform={jax.devices()[0].platform} N=2^18", flush=True)
    rng = np.random.default_rng(int(time.time() * 1000) % 2 ** 31)
    m0 = jnp.asarray(rng.standard_normal((N, 5)) * 0.01 + x_ss, jnp.float32)
    jax.block_until_ready(m0)
    legs = sys.argv[1:] or ["noise", "sigma", "predict", "update"]
    if "rbg" in legs:
        rbg_noise_leg()
        legs = [l for l in legs if l != "rbg"]
    for leg in legs:
        t_lo = measure(make(leg, K_LO), m0, rng)
        t_hi = measure(make(leg, K_HI), m0, rng)
        print(f"{leg:8s} T(1)={t_lo:8.2f} T(9)={t_hi:8.2f} "
              f"slope={(t_hi - t_lo) / 8:7.3f} ms/step", flush=True)




def rbg_noise_leg():
    """Same noise leg under the rbg PRNG (hardware RNG lowering)."""
    rng = np.random.default_rng(int(time.time() * 1000) % 2 ** 31)
    m0 = jnp.asarray(rng.standard_normal((N, 5)) * 0.01 + x_ss, jnp.float32)

    def make_rbg(k):
        @jax.jit
        def run(m0, eps):
            means = m0 + eps * 1e-9
            key = jax.random.key(
                jnp.abs(eps * 1e6).astype(jnp.int32), impl="rbg")
            for i in range(k):
                key, sub = jax.random.split(key)
                noise = state_pdf.draw(sub, (N, 11))
                means = means + 1e-9 * noise[:, 0, :]
            return jnp.sum(means)
        return run

    t_lo = measure(make_rbg(K_LO), m0, rng)
    t_hi = measure(make_rbg(K_HI), m0, rng)
    print(f"noise[rbg] T(1)={t_lo:8.2f} T(9)={t_hi:8.2f} "
          f"slope={(t_hi - t_lo) / 8:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
