"""Instrumentation tests: PickleJar memoization, RunSequences, pacf
(cf. /root/reference/tests/picklejar_test.py and the benchmark-quality
gate in pf_run_seq.py)."""
import shutil
import time

import numpy as np
import pytest

from gpu_se_tpu.utils import (
    PickleJar,
    RunSequences,
    acf,
    max_abs_pacf,
    pacf,
)
from gpu_se_tpu.utils.cache import _REPO_ROOT

calls = {"n": 0}


@PickleJar.pickle("test_cache")
def slow_square(x):
    calls["n"] += 1
    return x * x


def test_picklejar_memoizes():
    slow_square.clear_single(7)
    calls["n"] = 0
    assert slow_square(7) == 49
    assert calls["n"] == 1
    assert slow_square(7) == 49
    assert calls["n"] == 1  # served from disk
    slow_square.clear_single(7)
    assert slow_square(7) == 49
    assert calls["n"] == 2  # recomputed after clear


def test_picklejar_force_rerun():
    from gpu_se_tpu.utils import global_cache_settings

    slow_square.clear_single(3)
    calls["n"] = 0
    slow_square(3)
    global_cache_settings["force_rerun"] = True
    try:
        slow_square(3)
        assert calls["n"] == 2
    finally:
        global_cache_settings["force_rerun"] = False


def test_run_sequences():
    @RunSequences.vectorize
    def bench(n, scale):
        return np.arange(3) * n * scale

    ns, seqs = bench([1, 2, 4], 10)
    np.testing.assert_array_equal(ns, [1, 2, 4])
    assert seqs.shape == (3, 3)
    np.testing.assert_array_equal(seqs[2], np.arange(3) * 40)


def test_pacf_white_noise():
    rng = np.random.default_rng(0)
    x = rng.normal(size=4000)
    assert max_abs_pacf(x, 10) < 0.1  # independent samples pass the gate


def test_pacf_ar1():
    rng = np.random.default_rng(1)
    n, phi = 4000, 0.8
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = phi * x[i - 1] + rng.normal()
    p = pacf(x, 5)
    assert p[1] == pytest.approx(phi, abs=0.05)
    # AR(1): partial autocorrelations beyond lag 1 vanish
    assert np.abs(p[2:]).max() < 0.08
    assert max_abs_pacf(x, 10) > 0.2  # correlated samples fail the gate


def test_acf_matches_numpy_corrcoef():
    rng = np.random.default_rng(2)
    x = rng.normal(size=2000).cumsum()
    a = acf(x, 3)
    assert a[0] == 1.0
    assert a[1] > 0.9  # random walk is highly autocorrelated


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from gpu_se_tpu.filters import particle as pf_core
    from gpu_se_tpu.distributions import GaussianSum
    from gpu_se_tpu.utils.checkpoint import StateCheckpointer

    x0 = GaussianSum.create(np.zeros((1, 3)), np.eye(3)[None], np.array([1.0]))
    state = pf_core.init(jax.random.PRNGKey(0), 32, x0)

    ckpt = StateCheckpointer(str(tmp_path / "ckpt"))
    ckpt.save(5, state)
    assert ckpt.latest_step() == 5
    restored = ckpt.restore(state)
    np.testing.assert_array_equal(
        np.asarray(restored.particles), np.asarray(state.particles)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.weights), np.asarray(state.weights)
    )
    ckpt.close()
