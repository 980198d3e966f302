"""v4 tiled-resample kernel tests (interpret mode on CPU).

The device-side bit-exactness ladder lives in scripts/validate_v4.py
(real TPU, 2^12/2^16/2^20); these pin the pieces the CPU can check:
the compaction kernel's exact output, fast-path engagement for
realistic weights, and end-to-end bitwise equality on both paths.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gpu_se_tpu.filters.resampling import (
    sorted_row_gather,
    systematic_resample_indices,
)
from gpu_se_tpu.ops import resample_pallas4 as rp4
from gpu_se_tpu.ops.resample_coarse import ends_from_weights

N = 4096


def _tiled(parts, ends, wt):
    n = parts.shape[0]
    t_alloc = n // 128 + wt
    p8 = np.zeros((8, t_alloc * 128), np.float32)
    p8[:5, :n] = parts.T
    p8[rp4.IDX_ROW, :n] = np.arange(n)
    p8[rp4.ENDS_ROW, :n] = ends
    p8[rp4.ENDS_ROW, n:] = rp4.BIG
    return jnp.asarray(
        p8.reshape(8, t_alloc, 128).transpose(1, 0, 2).reshape(t_alloc, 1024)
    )


def test_compaction_kernel_exact():
    """Compacted payload = exactly the entries with strictly-increasing
    ends (the possible ancestors), contiguous, with pad tail."""
    rng = np.random.default_rng(0)
    w = np.exp(rng.standard_normal(N)).astype(np.float32)
    w[: N // 2] = 1e-12
    parts = rng.standard_normal((N, 5)).astype(np.float32)
    ends = np.asarray(ends_from_weights(jnp.asarray(w), jnp.float32(0.4)))
    wt = 3 * 32 + 8
    ct = np.asarray(rp4._compact(_tiled(parts, ends, wt), N, wt, True))
    keep = np.concatenate([[ends[0] > -1], ends[1:] > ends[:-1]])
    kidx = np.nonzero(keep)[0]
    nk = len(kidx)
    cref = ct.reshape(-1, 8, 128)
    c_ends = cref[:, rp4.ENDS_ROW, :].reshape(-1)
    c_idx = cref[:, rp4.IDX_ROW, :].reshape(-1)
    assert nk > 0
    np.testing.assert_array_equal(c_ends[:nk], ends[kidx].astype(np.float32))
    np.testing.assert_array_equal(c_idx[:nk], kidx.astype(np.float32))
    assert np.all(c_ends[nk:] == rp4.BIG)
    for s in range(5):
        cs = cref[:, s, :].reshape(-1)
        np.testing.assert_array_equal(cs[:nk], parts.T[s][kidx])
        assert np.all(cs[nk:] == 0.0)


def test_both_paths_bitwise_vs_xla():
    rng = np.random.default_rng(1)
    parts = rng.standard_normal((N, 5)).astype(np.float32)
    for case in ("random", "dead_runs", "onehot"):
        w = np.exp(rng.standard_normal(N)).astype(np.float32)
        if case == "dead_runs":
            w[: N // 2] = 1e-12
        elif case == "onehot":
            w = np.full(N, 1e-12, np.float32)
            w[N // 3] = 1.0
        r = np.float32(rng.uniform())
        idx = np.asarray(
            systematic_resample_indices(jnp.asarray(w), jnp.asarray(r)))
        ref = np.asarray(sorted_row_gather(jnp.asarray(parts), jnp.asarray(idx)))
        out, anc = rp4.pallas_systematic_resample_tiled(
            jnp.asarray(parts), jnp.asarray(w), jnp.asarray(r), interpret=True)
        np.testing.assert_array_equal(np.asarray(anc), idx, err_msg=case)
        np.testing.assert_array_equal(np.asarray(out), ref, err_msg=case)


def test_fast_path_engages_for_realistic_weights():
    """The sampled pre-check + span flags must NOT push ordinary weight
    families onto the compaction path (they fit 3-tile slabs)."""
    rng = np.random.default_rng(5)
    for case in ("uniform", "lognormal"):
        if case == "uniform":
            w = np.ones(N, np.float32)
        else:
            w = np.exp(rng.standard_normal(N)).astype(np.float32)
        cs = np.cumsum(w.astype(np.float64))
        cs /= cs[-1]
        ends = np.clip(np.maximum.accumulate(
            np.floor(N * cs - 0.37)), -1, N - 1).astype(np.int64)
        o = np.searchsorted(ends, np.arange(0, N + 128, 128), side="left")
        assert np.diff(o).max() <= 256, case          # span flag quiet
        s256 = np.maximum(ends[::256], 0) >> 7
        assert not np.any(s256[1:] == s256[:-1]), case  # pre-check quiet
