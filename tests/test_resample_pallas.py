"""Pallas fused-resampling kernel tests (interpret mode on the CPU suite;
the compiled path is exercised on real TPU by the verification drivers)."""
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_se_tpu.filters.resampling import systematic_resample_indices
from gpu_se_tpu.ops.resample_pallas import pallas_systematic_resample


@pytest.mark.parametrize("case", ["uniform", "random", "degenerate", "clustered"])
def test_kernel_matches_reference(case):
    rng = np.random.default_rng(hash(case) % 2**31)
    n = 2048
    if case == "uniform":
        w = np.full(n, 1.0 / n, np.float32)
    elif case == "random":
        w = rng.exponential(size=n).astype(np.float32)
    elif case == "degenerate":
        w = np.full(n, 1e-12, np.float32)
        w[n // 3] = 1.0
    else:  # clustered: all mass in the last block
        w = np.full(n, 1e-12, np.float32)
        w[-64:] = rng.uniform(0.5, 1.0, 64).astype(np.float32)
    parts = rng.normal(size=(n, 5)).astype(np.float32)
    for r in (0.0, 0.41, 0.999):
        out, anc = pallas_systematic_resample(
            jnp.asarray(parts), jnp.asarray(w), r, 256, 256, interpret=True
        )
        ref_idx = np.asarray(
            systematic_resample_indices(jnp.asarray(w), jnp.float32(r))
        )
        anc = np.asarray(anc)
        assert (anc == ref_idx).mean() > 0.999, case
        np.testing.assert_allclose(np.asarray(out), parts[anc], atol=1e-6)


def test_kernel_block_window_shapes():
    rng = np.random.default_rng(5)
    n = 4096
    w = rng.uniform(size=n).astype(np.float32)
    parts = rng.normal(size=(n, 5)).astype(np.float32)
    ref = np.asarray(systematic_resample_indices(jnp.asarray(w), jnp.float32(0.2)))
    for b, win in [(512, 256), (256, 512), (1024, 1024)]:
        out, anc = pallas_systematic_resample(
            jnp.asarray(parts), jnp.asarray(w), 0.2, b, win, interpret=True
        )
        assert (np.asarray(anc) == ref).mean() > 0.999, (b, win)
