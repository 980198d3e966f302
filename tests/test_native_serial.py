"""C++ serial reference engine: builds, and matches the JAX functional
core step for step under shared noise — the cross-implementation parity
check (the reference's CPU-vs-GPU test_same, /root/reference/tests/GSUKF_test.py:48-99,
recast as native-vs-JAX)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_se_tpu.distributions import GaussianSum
from gpu_se_tpu.filters import particle as pf_core
from gpu_se_tpu.filters.resampling import systematic_resample_indices
from gpu_se_tpu.models import bioreactor as bio
from gpu_se_tpu.native import serial


pytestmark = pytest.mark.skipif(not serial.available(), reason="no C++ toolchain")


MEAS_MEANS = np.array([[1e-1, 0.0], [0.0, -1e-1]])
MEAS_COVS = np.array([[[6e-2, 0], [0, 8e-2]], [[500.0, 100.0], [100.0, 700.0]]])
MEAS_W = np.array([0.85, 0.15])


def test_homeostatic_des_matches_python():
    lib = serial._load()
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = rng.uniform(-1, 30, 5)
        u = rng.uniform(0, 0.3, 2)
        out = np.empty(5)
        lib.homeostatic_des(x, u, 0.1, out)
        expected = bio.homeostatic_des(x, u, 0.1, xp=np)
        np.testing.assert_allclose(out, expected, rtol=1e-12)


def test_native_matches_jax_core_under_shared_noise():
    n = 256
    rng = np.random.default_rng(1)
    x_ss = np.array([280 / 180, 640 / 24.6, 1000 / 116, 0.0, 0.0])
    particles0 = x_ss + rng.normal(0, 0.01, (n, 5))
    noise = rng.normal(0, 1e-3, (n, 5))
    u = np.array([0.06, 0.2])
    z = np.array([280.0, 1000.0])
    r = 0.371

    # native engine
    eng = serial.SerialParticleFilter(particles0, MEAS_MEANS, MEAS_COVS, MEAS_W)
    eng.predict(u, 0.1, noise)
    eng.update(z)
    idx_native = eng.resample(r)

    # JAX core with the same injected noise
    parts = jnp.asarray(particles0, jnp.float32)
    deltas = jax.vmap(bio.Bioreactor.homeostatic_DEs, in_axes=(0, None, None))(
        parts, jnp.asarray(u, jnp.float32), jnp.float32(0.1)
    )
    parts = parts + deltas + jnp.asarray(noise, jnp.float32)
    meas = GaussianSum.create(MEAS_MEANS, MEAS_COVS, MEAS_W)
    ys = jax.vmap(bio.Bioreactor.static_outputs, in_axes=(0, None))(
        parts, jnp.asarray(u, jnp.float32)
    )
    weights = meas.pdf(jnp.asarray(z, jnp.float32) - ys) / n
    idx_jax = np.asarray(systematic_resample_indices(weights, jnp.float32(r)))

    np.testing.assert_allclose(
        np.asarray(parts), eng.particles, rtol=1e-4, atol=1e-5
    )
    # ancestor indices agree except possibly at float32 bin boundaries
    mismatch = np.mean(idx_native != idx_jax)
    assert mismatch < 0.01, f"ancestor mismatch fraction {mismatch}"
    est = eng.point_estimate()
    assert np.isfinite(est).all()


def test_native_resample_matches_reference_walk():
    lib = serial._load()
    rng = np.random.default_rng(2)
    n = 1000
    w = rng.uniform(0.0, 1.0, n) + 1e-9
    for r in (0.0, 0.25, 0.9):
        idx = np.empty(n, dtype=np.int64)
        lib.systematic_resample_indices(w, n, r, idx)
        # python reference walk
        cs = np.cumsum(w) / w.sum()
        expected = np.zeros(n, dtype=np.int64)
        k = 0
        for i in range(n):
            u = (i + r) / n
            while cs[k] < u and k < n - 1:
                k += 1
            expected[i] = k
        np.testing.assert_array_equal(idx, expected)
