"""Pipelined Pallas resampling kernel (v3) tests — interpret mode on the
CPU suite; the compiled path is validated on real TPU by
scripts/probe_v3_pipe.py. Semantics must be identical to the XLA
formulation AND to the v1 kernel (same merge algorithm, pipelined DMAs)."""
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_se_tpu.filters.resampling import systematic_resample_indices
from gpu_se_tpu.ops.resample_pallas3 import pallas_systematic_resample_pipelined


@pytest.mark.parametrize("case", ["uniform", "random", "degenerate", "clustered"])
def test_pipelined_kernel_matches_reference(case):
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
        out, anc = pallas_systematic_resample_pipelined(
            jnp.asarray(parts), jnp.asarray(w), r, 256, 256, interpret=True
        )
        ref_idx = np.asarray(
            systematic_resample_indices(jnp.asarray(w), jnp.float32(r))
        )
        anc = np.asarray(anc)
        assert (anc == ref_idx).mean() > 0.999, case
        np.testing.assert_allclose(np.asarray(out), parts[anc], atol=1e-6)


def test_pipelined_kernel_block_window_shapes():
    rng = np.random.default_rng(5)
    n = 4096
    w = rng.uniform(size=n).astype(np.float32)
    parts = rng.normal(size=(n, 5)).astype(np.float32)
    ref = np.asarray(systematic_resample_indices(jnp.asarray(w), jnp.float32(0.2)))
    # includes the production geometry (128, 256) and b > w corners
    for b, win in [(128, 256), (512, 256), (256, 512), (1024, 1024), (128, 128)]:
        out, anc = pallas_systematic_resample_pipelined(
            jnp.asarray(parts), jnp.asarray(w), 0.2, b, win, interpret=True
        )
        assert (np.asarray(anc) == ref).mean() > 0.999, (b, win)


def test_pipelined_matches_v1_bitwise():
    from gpu_se_tpu.ops.resample_pallas import pallas_systematic_resample

    rng = np.random.default_rng(11)
    n = 4096
    w = rng.exponential(size=n).astype(np.float32)
    parts = rng.normal(size=(n, 5)).astype(np.float32)
    out1, anc1 = pallas_systematic_resample(
        jnp.asarray(parts), jnp.asarray(w), 0.37, 512, 256, interpret=True
    )
    out3, anc3 = pallas_systematic_resample_pipelined(
        jnp.asarray(parts), jnp.asarray(w), 0.37, 512, 256, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(anc1), np.asarray(anc3))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out3))
