"""Tiled-state distributed PF step (round 5): CPU-mesh tests.

The per-shard state stays in the v4 (t_data, 1024) layout across steps
(parallel/sharded.make_shard_map_tiled_step). These pin:

* the distributed resample stage bitwise against the single-device XLA
  formulation for FIXED (particles, weights, r) — same invariant every
  other distributed impl carries;
* a full chained run on the 8-device mesh: finite, and statistically
  consistent with the single-device tiled step (the noise stream is
  per-shard fold_in, so realizations differ by construction).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpu_se_tpu.distributions import GaussianSum
from gpu_se_tpu.filters import particle_tiled as pft
from gpu_se_tpu.filters.resampling import (
    sorted_row_gather,
    systematic_resample_indices,
)
from gpu_se_tpu.models import bioreactor as bio
from gpu_se_tpu.parallel import (
    make_mesh,
    make_shard_map_tiled_step,
    shard_tiled_pf_state,
)
from gpu_se_tpu.parallel.mesh import PARTICLE_AXIS
from gpu_se_tpu.parallel.sharded import (
    _a2a_compact_exchange_merge,
    _distributed_systematic_resample,
    _segmented_ends,
)

X_SS = np.array([280 / 180, 640 / 24.6, 1000 / 116, 0.0, 0.0])
N = 8 * 4096         # 4096 per shard on the 8-device mesh


def _rig():
    x0 = GaussianSum.create(
        np.stack([X_SS, X_SS]),
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
    return x0, state_pdf, meas_pdf


def test_tiled_distributed_resample_bitwise():
    """compact -> exchange -> merge on the tiled layout == the
    distributed XLA scatter+ring path, BITWISE, for degenerate weights.

    The comparator is the distributed reference (same segmented-ends
    formulation): the single-device cumsum differs from segmented ends
    by ulp boundary ties (a handful of slots at 2^15), the documented
    cross-formulation tie class — within the distributed family the
    equality is exact."""
    from jax import shard_map

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    parts = rng.standard_normal((N, 5)).astype(np.float32)
    w = np.exp(rng.standard_normal(N)).astype(np.float32)
    w[: N - N // 16] = 1e-12            # degenerate: compaction regime
    r = jnp.float32(0.43)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(PARTICLE_AXIS, None), P(PARTICLE_AXIS), P()),
        out_specs=P(PARTICLE_AXIS, None), check_vma=False)
    def dist(tiled, w_local, r):
        n_local = tiled.shape[0] * 128
        ends, prev = _segmented_ends(w_local, r, PARTICLE_AXIS)
        ends_loc = (ends - (prev + 1)).astype(jnp.float32)
        x = jnp.stack([tiled[:, d * 128:(d + 1) * 128] for d in range(5)])
        body = pft.build_body(
            x, ends_loc.reshape(-1, 128), 5, with_index=False)
        return _a2a_compact_exchange_merge(
            body, prev, n_local, 5, PARTICLE_AXIS,
            exchange="ring", interpret=True, return_tiled=True)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(PARTICLE_AXIS, None), P(PARTICLE_AXIS), P()),
        out_specs=(P(PARTICLE_AXIS, None), P(PARTICLE_AXIS)),
        check_vma=False)
    def dist_ref(parts_l, w_local, r):
        return _distributed_systematic_resample(
            parts_l, w_local, r, PARTICLE_AXIS)

    st = pft.tile(jnp.asarray(parts), jax.random.PRNGKey(0))
    tiled_sh = jax.device_put(
        st.tiled, NamedSharding(mesh, P(PARTICLE_AXIS, None)))
    out_tiled = dist(tiled_sh, jnp.asarray(w), r)
    got = np.asarray(pft.untile(
        pft.TiledPFState(tiled=out_tiled, key=st.key), 5))

    want, _ = dist_ref(jnp.asarray(parts), jnp.asarray(w), r)
    np.testing.assert_array_equal(got, np.asarray(want))

    # and the single-device formulation agrees up to ulp boundary ties
    idx = systematic_resample_indices(jnp.asarray(w), r)
    sd = np.asarray(sorted_row_gather(jnp.asarray(parts), idx))
    mismatch = np.mean(np.any(got != sd, axis=1))
    assert mismatch < 1e-3, mismatch


def test_tiled_sharded_step_runs_and_is_consistent():
    x0, state_pdf, meas_pdf = _rig()
    mesh = make_mesh(8)
    f = functools.partial(bio.homeostatic_des, xp=jnp)
    g = functools.partial(bio.static_outputs, xp=jnp)
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(X_SS, np.asarray(u), xp=np),
                    jnp.float32)

    step = make_shard_map_tiled_step(mesh, f, g, exchange="ring",
                                     interpret=True)
    st = shard_tiled_pf_state(
        pft.init(jax.random.PRNGKey(5), N, x0), mesh)
    jstep = jax.jit(lambda s: step(s, u, z, jnp.float32(0.1),
                                   state_pdf, meas_pdf))
    for _ in range(3):
        st = jstep(st)
    est = np.asarray(pft.point_estimate(st, 5))
    assert np.isfinite(est).all()

    # single-device tiled step from the same start: different noise
    # realization, same distribution — means agree to sampling error
    sd = pft.init(jax.random.PRNGKey(5), N, x0)
    for _ in range(3):
        sd = pft.step(sd, u, z, jnp.float32(0.1), f, g,
                      state_pdf, meas_pdf, interpret=True)
    est_sd = np.asarray(pft.point_estimate(sd, 5))
    # near-zero states (Ce, Ch) carry realization variance comparable
    # to the state-noise scale under tiny-ESS resampling — floor the
    # relative scale at ~3 noise stds rather than at 0.05
    scale = np.maximum(np.abs(est_sd), 0.3)
    assert np.all(np.abs(est - est_sd) / scale < 0.2), (est, est_sd)
