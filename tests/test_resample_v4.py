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


# ----------------------------------------------------------------------
# round-5 bank generalization (rows=24, symmetric-packed covariances)
# ----------------------------------------------------------------------
def _bank(rng, n, degenerate=False):
    means = rng.standard_normal((n, 5)).astype(np.float32)
    a = rng.standard_normal((n, 5, 5)).astype(np.float32)
    covs = np.einsum("nij,nkj->nik", a, a).astype(np.float32)
    covs = 0.5 * (covs + covs.transpose(0, 2, 1))  # exactly symmetric
    w = np.exp(rng.standard_normal(n)).astype(np.float32)
    if degenerate:
        w[: n - n // 16] = 1e-12
    return jnp.asarray(means), jnp.asarray(covs), jnp.asarray(w)


def test_bank_kernel_bitwise_vs_xla():
    from gpu_se_tpu.filters.resampling import (
        sorted_row_gather, systematic_resample_indices)

    rng = np.random.default_rng(12)
    for degenerate in (False, True):
        means, covs, w = _bank(rng, N, degenerate)
        r = jnp.float32(0.37)
        m2, c2, anc = rp4.pallas_systematic_resample_bank(
            means, covs, w, r, interpret=True)
        idx = systematic_resample_indices(w, r)
        np.testing.assert_array_equal(np.asarray(anc), np.asarray(idx))
        np.testing.assert_array_equal(
            np.asarray(m2), np.asarray(sorted_row_gather(means, idx)))
        np.testing.assert_array_equal(
            np.asarray(c2), np.asarray(sorted_row_gather(covs, idx)))


def test_bank_route_respects_impl_override():
    """systematic_resample_bank under impl('bank_interpret') must equal
    the generic XLA pytree path bitwise (same key -> same r)."""
    from gpu_se_tpu.filters import resampling as rs

    rng = np.random.default_rng(13)
    means, covs, w = _bank(rng, N, degenerate=True)
    key = jax.random.PRNGKey(5)
    with rs.impl("bank_interpret"):
        (m2, c2), w2 = rs.systematic_resample_bank(means, covs, w, key)
    with rs.impl("xla"):
        (m1, c1), w1 = rs.systematic_resample((means, covs), w, key)
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(m1))
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(w2), np.asarray(w1))


def test_update_core_covariances_exactly_symmetric():
    """update_core's K P K' symmetrization keeps the bank covariances
    bitwise symmetric (the bank kernel's packing contract)."""
    from gpu_se_tpu.distributions import GaussianSum
    from gpu_se_tpu.filters import gs_ukf
    from gpu_se_tpu.models import bioreactor as bio

    n = 256
    x_ss = np.array([280 / 180, 640 / 24.6, 1000 / 116, 0.0, 0.0])
    x0 = GaussianSum.create(
        np.stack([x_ss, x_ss]),
        np.stack([np.eye(5) * 1e-4, np.eye(5) * 1e-3]),
        np.array([0.75, 0.25]))
    state_pdf = GaussianSum.create(
        np.zeros((2, 5)),
        np.stack([np.diag([1e-4, 1e-7, 1e-3, 1e-3, 1e-7]),
                  np.diag([1e-3, 1e-6, 1e-2, 1e-2, 1e-6])]),
        np.array([0.75, 0.25]))
    meas_pdf = GaussianSum.create(
        np.array([[1e-1, 0], [0, -1e-1]]),
        np.array([[[6e-2, 0], [0, 8e-2]], [[500, 100], [100, 700]]]),
        np.array([0.85, 0.15]))
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(
        bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    st = gs_ukf.init(jax.random.PRNGKey(0), n, x0, state_pdf)
    st = gs_ukf.predict(st, u, jnp.float32(0.1),
                        bio.Bioreactor.homeostatic_DEs, state_pdf)
    cp = np.asarray(st.covariances)
    np.testing.assert_array_equal(cp, cp.transpose(0, 2, 1))
    st = gs_ukf.update(st, u, z, bio.Bioreactor.static_outputs, meas_pdf)
    cu = np.asarray(st.covariances)
    np.testing.assert_array_equal(cu, cu.transpose(0, 2, 1))


def test_padded_arbitrary_n_bitwise():
    """Round 5: non-block-multiple n rides the kernel via above-range
    ends padding — bitwise vs XLA at odd sizes on both weight regimes."""
    from gpu_se_tpu.filters.resampling import (
        sorted_row_gather, systematic_resample_indices)

    rng = np.random.default_rng(21)
    for n in (5003, 8191, 12289):
        for degenerate in (False, True):
            parts = jnp.asarray(
                rng.standard_normal((n, 5)), jnp.float32)
            w = np.exp(rng.standard_normal(n)).astype(np.float32)
            if degenerate:
                w[: n - n // 16] = 1e-12
            w = jnp.asarray(w)
            r = jnp.float32(rng.uniform())
            out, anc = rp4.pallas_systematic_resample_tiled(
                parts, w, r, interpret=True)
            idx = systematic_resample_indices(w, r)
            np.testing.assert_array_equal(np.asarray(anc), np.asarray(idx))
            np.testing.assert_array_equal(
                np.asarray(out), np.asarray(sorted_row_gather(parts, idx)))


def test_bank_padded_arbitrary_n_bitwise():
    from gpu_se_tpu.filters.resampling import (
        sorted_row_gather, systematic_resample_indices)

    rng = np.random.default_rng(22)
    n = 5000
    means, covs, w = _bank(rng, n, degenerate=True)
    r = jnp.float32(0.61)
    m2, c2, anc = rp4.pallas_systematic_resample_bank(
        means, covs, w, r, interpret=True)
    idx = systematic_resample_indices(w, r)
    np.testing.assert_array_equal(np.asarray(anc), np.asarray(idx))
    np.testing.assert_array_equal(
        np.asarray(m2), np.asarray(sorted_row_gather(means, idx)))
    np.testing.assert_array_equal(
        np.asarray(c2), np.asarray(sorted_row_gather(covs, idx)))
