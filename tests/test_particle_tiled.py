"""Tiled-state PF step tests (interpret-mode kernels on CPU).

Pins the round-5 tiled-state step (filters/particle_tiled.py) bitwise
against a flat comparator built from the SAME lanes-last primitives
(draw_t / pdf_t / ends_from_weights) with the resample routed through
the XLA scatter+cummax formulation — so any divergence is a bug in the
tiled plumbing or the kernel path, not a stream/association artifact.
Also: tile/untile round trip, multi-step chaining on both weight
regimes (direct + compacted kernel paths), and statistical agreement
with the untiled production step.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gpu_se_tpu.distributions import GaussianSum
from gpu_se_tpu.filters import particle as pf_core
from gpu_se_tpu.filters import particle_tiled as pft
from gpu_se_tpu.filters.resampling import (
    sorted_row_gather,
)
from gpu_se_tpu.models import bioreactor as bio
from gpu_se_tpu.ops.resample_coarse import (
    ends_from_weights,
    indices_from_ends,
)

N = 8192
NX = 5

X_SS = np.array([280 / 180, 640 / 24.6, 1000 / 116, 0.0, 0.0])


def _rig():
    x0 = GaussianSum.create(
        np.stack([X_SS, X_SS]),
        np.stack([np.eye(5) * 1e-4, np.eye(5) * 1e-3]),
        np.array([0.75, 0.25]),
    )
    state_pdf = GaussianSum.create(
        np.zeros((2, 5)),
        np.stack([
            np.diag([1e-4, 1e-7, 1e-3, 1e-3, 1e-7]),
            np.diag([1e-3, 1e-6, 1e-2, 1e-2, 1e-6]),
        ]),
        np.array([0.75, 0.25]),
    )
    meas_pdf = GaussianSum.create(
        np.array([[1e-1, 0], [0, -1e-1]]),
        np.array([[[6e-2, 0], [0, 8e-2]], [[500, 100], [100, 700]]]),
        np.array([0.85, 0.15]),
    )
    return x0, state_pdf, meas_pdf


F_SOA = functools.partial(bio.homeostatic_des, xp=jnp)
G_SOA = functools.partial(bio.static_outputs, xp=jnp)
U = jnp.array([0.06, 0.2])
DT = jnp.float32(0.1)


def _z(x0):
    return jnp.asarray(
        bio.static_outputs(X_SS, np.asarray(U), xp=np), jnp.float32)


def _flat_comparator_step(particles, key, state_pdf, meas_pdf, z):
    """The same semantics on the flat (n, nx) layout with the XLA
    resample: bitwise-identical per-particle values by construction
    (elementwise ops on a different shape)."""
    n = particles.shape[0]
    key, kn, kr = jax.random.split(key, 3)
    x = particles.T                                    # (nx, n)
    deltas = F_SOA(x, U, DT)
    noise = state_pdf.draw_t(kn, n)
    xn = x + deltas + noise
    ys = G_SOA(xn, U)
    w = meas_pdf.pdf_t(z.reshape(-1, 1) - ys)          # (n,)
    r = jax.random.uniform(kr, (), dtype=jnp.float32)
    ends = ends_from_weights(w, r)
    idx = indices_from_ends(ends)
    return sorted_row_gather(xn.T, idx), idx, key


def test_tile_untile_roundtrip():
    rng = np.random.default_rng(0)
    parts = rng.standard_normal((N, NX)).astype(np.float32)
    st = pft.tile(jnp.asarray(parts), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(pft.untile(st, NX)), parts)


def test_step_bitwise_vs_flat_comparator():
    x0, state_pdf, meas_pdf = _rig()
    z = _z(x0)
    key = jax.random.PRNGKey(7)
    parts = x0.draw(jax.random.PRNGKey(3), (N,))
    st = pft.tile(parts, key)
    out = pft.step(st, U, z, DT, F_SOA, G_SOA, state_pdf, meas_pdf,
                   interpret=True)
    got = np.asarray(pft.untile(out, NX))
    want, _, _ = _flat_comparator_step(parts, key, state_pdf, meas_pdf, z)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_step_bitwise_degenerate_weights():
    """Hyper-degenerate weights (the production bench regime) force the
    compaction path; output must stay bitwise-equal to the XLA route."""
    x0, state_pdf, meas_pdf = _rig()
    # an offset measurement concentrates the weights harder (ESS ~5 of
    # 8192, ~400 distinct ancestors) — still nonzero, unlike a far-off
    # z that underflows EVERY weight to 0.0 (ends = 0/0, undefined on
    # every path)
    z = _z(x0) + jnp.asarray([0.3, 0.3], jnp.float32)
    key = jax.random.PRNGKey(21)
    parts = x0.draw(jax.random.PRNGKey(5), (N,))
    st = pft.tile(parts, key)
    out = pft.step(st, U, z, DT, F_SOA, G_SOA, state_pdf, meas_pdf,
                   interpret=True)
    got = np.asarray(pft.untile(out, NX))
    want, idx, _ = _flat_comparator_step(parts, key, state_pdf, meas_pdf, z)
    # confirm this regime really is degenerate (few distinct ancestors)
    assert len(np.unique(np.asarray(idx))) < N // 8
    np.testing.assert_array_equal(got, np.asarray(want))


def test_chained_steps_bitwise():
    """Three chained tiled steps == three chained flat-comparator steps
    (the kernel output feeds the next step's input directly)."""
    x0, state_pdf, meas_pdf = _rig()
    z = _z(x0)
    key = jax.random.PRNGKey(11)
    parts = x0.draw(jax.random.PRNGKey(4), (N,))
    st = pft.tile(parts, key)
    flat = parts
    fkey = key
    for _ in range(3):
        st = pft.step(st, U, z, DT, F_SOA, G_SOA, state_pdf, meas_pdf,
                      interpret=True)
        flat, _, fkey = _flat_comparator_step(
            flat, fkey, state_pdf, meas_pdf, z)
    np.testing.assert_array_equal(
        np.asarray(pft.untile(st, NX)), np.asarray(flat))


def test_point_estimate_matches_untiled_mean():
    rng = np.random.default_rng(2)
    parts = rng.standard_normal((N, NX)).astype(np.float32)
    st = pft.tile(jnp.asarray(parts), jax.random.PRNGKey(0))
    got = np.asarray(pft.point_estimate(st, NX))
    np.testing.assert_allclose(got, parts.mean(axis=0), rtol=2e-5, atol=2e-6)


def test_statistical_agreement_with_untiled_step():
    """Different noise stream/association than particle.step, same
    distribution: after one step from the same start, the particle
    means must agree to sampling error."""
    x0, state_pdf, meas_pdf = _rig()
    z = _z(x0)
    parts = x0.draw(jax.random.PRNGKey(9), (N,))
    st = pft.step(
        pft.tile(parts, jax.random.PRNGKey(100)),
        U, z, DT, F_SOA, G_SOA, state_pdf, meas_pdf, interpret=True)
    tiled_mean = np.asarray(pft.point_estimate(st, NX))

    ref_state = pf_core.PFState(
        particles=parts,
        weights=jnp.full((N,), 1.0 / N, jnp.float32),
        key=jax.random.PRNGKey(200),
    )
    ref_state = pf_core.step(
        ref_state, U, z, DT,
        bio.Bioreactor.homeostatic_DEs, bio.Bioreactor.static_outputs,
        state_pdf, meas_pdf)
    ref_mean = np.asarray(pf_core.point_estimate(ref_state))
    scale = np.maximum(np.abs(ref_mean), 0.05)
    assert np.all(np.abs(tiled_mean - ref_mean) / scale < 0.2)


def test_pdf_t_matches_pdf():
    _, _, meas_pdf = _rig()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 257)).astype(np.float32)
    got = np.asarray(meas_pdf.pdf_t(jnp.asarray(x)))
    want = np.asarray(meas_pdf.pdf(jnp.asarray(x.T)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-30)
