"""Multi-chip particle filtering: GSPMD auto-sharding + explicit shard_map.

Two complementary paths over a 1-D ``Mesh('particles')``:

* :func:`auto_sharded_step` — the *same* functional PF step jitted with
  ``NamedSharding`` constraints. XLA partitions the vmapped f/g
  elementwise work, psums the weight reductions, and all-gathers for the
  resampling gather. With ``jax_threefry_partitionable`` the noise draws
  are bitwise identical to the single-device run, so shard-invariance is
  exact — this is the correctness anchor.

* :func:`shard_map_step` — explicit SPMD: per-shard predict/update, then
  distributed systematic resampling as local inclusive scan + exclusive
  offset from an all-gather of shard totals + all-gather particle
  exchange over ICI. This is the hand-scheduled analogue of the
  reference's CUDA pipeline (torch cumsum + Nicely kernel + gather,
  /root/reference/filter/particle.py:296-316) and the template for the
  >=2^24-particle regime where the exchange should become a ragged
  ppermute. Noise is drawn *outside* the shard_map with partitionable
  keys so both paths see identical randomness.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gpu_se_tpu.distributions.gaussian_sum import GaussianSum
from gpu_se_tpu.filters.particle import PFState
from gpu_se_tpu.filters.resampling import sorted_row_gather
from gpu_se_tpu.parallel.mesh import PARTICLE_AXIS


# ----------------------------------------------------------------------
# Path 1: GSPMD auto-sharding of the functional core
# ----------------------------------------------------------------------
def shard_pf_state(state: PFState, mesh: Mesh) -> PFState:
    """Place a PFState with particles/weights sharded over the mesh."""
    psh = NamedSharding(mesh, P(PARTICLE_AXIS))
    rsh = NamedSharding(mesh, P())
    return PFState(
        particles=jax.device_put(state.particles, NamedSharding(mesh, P(PARTICLE_AXIS, None))),
        weights=jax.device_put(state.weights, psh),
        key=jax.device_put(state.key, rsh),
    )


def make_auto_sharded_step(mesh: Mesh, f: Callable, g: Callable):
    """Jit the fused PF step with sharding constraints; XLA inserts the
    collectives (psum for moments, all-gather for the resample gather)."""
    from gpu_se_tpu.filters import particle as pf_core

    p_sh = NamedSharding(mesh, P(PARTICLE_AXIS, None))
    w_sh = NamedSharding(mesh, P(PARTICLE_AXIS))
    r_sh = NamedSharding(mesh, P())

    state_shardings = PFState(particles=p_sh, weights=w_sh, key=r_sh)

    @partial(
        jax.jit,
        in_shardings=(state_shardings, r_sh, r_sh, r_sh, None, None),
        out_shardings=state_shardings,
    )
    def step(state, u, z, dt, state_pdf, measurement_pdf):
        from gpu_se_tpu.filters import resampling

        # the Pallas resample custom call has no GSPMD partitioning rule;
        # the auto-sharded path must trace the XLA formulation
        with resampling.impl("xla"):
            return pf_core.step(state, u, z, dt, f, g, state_pdf, measurement_pdf)

    return step


# ----------------------------------------------------------------------
# Path 2: explicit shard_map SPMD
# ----------------------------------------------------------------------
def _local_predict(particles, u, dt, noise, f):
    deltas = jax.vmap(f, in_axes=(0, None, None))(particles, u, dt)
    return particles + deltas + noise


def _local_update(particles, weights, u, z, g, measurement_pdf):
    ys = jax.vmap(g, in_axes=(0, None))(particles, u)
    return weights * measurement_pdf.pdf(z - ys)


def _distributed_systematic_resample(pytree, weights, r, axis: str):
    """Systematic resample across shards of any pytree of (n_local, ...)
    arrays (particles for the PF; (means, covariances) for the GSUKF —
    the analogue of /root/reference/filter/gs_ukf.py:409-436).

    The global cumsum is computed over the all-gathered weight vector,
    REPLICATED on every shard — same bytes over ICI as gathering a local
    cumsum, but the scan input (and hence every f32 rounding) is identical
    for every mesh width and for the single-device path. The earlier
    local-scan + f32-offset formulation grouped the summation differently
    per width, which at 2^22 degenerate weights shifted resample
    boundaries enough to move the point estimate by ~3% between widths
    (pinned in tests/test_sharding.py::test_big_n_width_invariance).
    """
    n_local = weights.shape[0]
    idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)

    w_all = jax.lax.all_gather(weights, axis).reshape(-1)  # (n_global,)
    cum_global = jnp.cumsum(w_all)
    cum_global = cum_global / cum_global[-1]
    # tree cumsum can dip by an ulp; searchsorted needs sorted input
    cum_global = jax.lax.cummax(cum_global)

    n_global = n_local * n_shards
    slots = idx * n_local + jnp.arange(n_local)
    # u_i = i/n + r/n, NOT (i+r)/n: at i ~ 2^21 the f32 sum (i + r)
    # quantizes r to the 0.25 ulp of big ints, visibly biasing the strata;
    # both products stay in [0, 1) where f32 has full 2^-24 resolution
    inv_n = jnp.asarray(1.0 / n_global, weights.dtype)
    u_pos = slots.astype(weights.dtype) * inv_n + r * inv_n
    ancestors = jnp.clip(
        jnp.searchsorted(cum_global, u_pos, side="left", method="sort"),
        0,
        n_global - 1,
    )

    # barrier: keep XLA from fusing the index computation into the gather
    # (see gpu_se_tpu/filters/resampling.py); each shard's ancestor slice
    # is itself monotone non-decreasing, so the sorted-gather lowering
    # applies shard-locally too
    ancestors = jax.lax.optimization_barrier(ancestors)

    def gather_leaf(a):
        pool = jax.lax.all_gather(a, axis).reshape((n_global,) + a.shape[1:])
        return sorted_row_gather(pool, ancestors)

    new_tree = jax.tree_util.tree_map(gather_leaf, pytree)
    new_weights = jnp.full((n_local,), 1.0 / n_global, dtype=weights.dtype)
    return new_tree, new_weights


def make_shard_map_step(mesh: Mesh, f: Callable, g: Callable,
                        axis: str = PARTICLE_AXIS):
    """Fused sharded PF step with hand-written collectives.

    Noise/uniform draws happen outside the shard_map with partitionable
    keys, so results are bitwise identical to the single-device step
    whenever XLA keeps the elementwise math in the same order.
    """

    def step(state: PFState, u, z, dt, state_pdf: GaussianSum,
             measurement_pdf: GaussianSum) -> PFState:
        n = state.particles.shape[0]
        key, k_noise, k_r = jax.random.split(state.key, 3)
        noise = state_pdf.draw(k_noise, (n,))
        r = jax.random.uniform(k_r, ())

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(axis, None), P(axis), P(), P(), P(), P(axis, None), P(),
            ),
            out_specs=(P(axis, None), P(axis)),
            check_vma=False,
        )
        def sharded(particles, weights, u, z, dt, noise, r):
            particles = _local_predict(particles, u, dt, noise, f)
            weights = _local_update(particles, weights, u, z, g, measurement_pdf)
            particles, weights = _distributed_systematic_resample(
                particles, weights, r, axis
            )
            return particles, weights

        particles, weights = sharded(
            state.particles, state.weights, u, z,
            jnp.asarray(dt, state.particles.dtype), noise, r,
        )
        return PFState(particles=particles, weights=weights, key=key)

    p_sh = NamedSharding(mesh, P(axis, None))
    w_sh = NamedSharding(mesh, P(axis))
    r_sh = NamedSharding(mesh, P())
    state_shardings = PFState(particles=p_sh, weights=w_sh, key=r_sh)
    return jax.jit(
        step,
        in_shardings=(state_shardings, r_sh, r_sh, None, None, None),
        out_shardings=state_shardings,
    )


# ----------------------------------------------------------------------
# GSUKF sharding: the same particle-axis story over the Gaussian bank
# ----------------------------------------------------------------------
def shard_gsukf_state(state, mesh: Mesh):
    """Place a GSUKFState with the bank axis sharded over the mesh."""
    from gpu_se_tpu.filters.gs_ukf import GSUKFState

    return GSUKFState(
        means=jax.device_put(state.means, NamedSharding(mesh, P(PARTICLE_AXIS, None))),
        covariances=jax.device_put(
            state.covariances, NamedSharding(mesh, P(PARTICLE_AXIS, None, None))
        ),
        weights=jax.device_put(state.weights, NamedSharding(mesh, P(PARTICLE_AXIS))),
        key=jax.device_put(state.key, NamedSharding(mesh, P())),
    )


def make_auto_sharded_gsukf_step(mesh: Mesh, f: Callable, g: Callable):
    """GSPMD-sharded fused GSUKF step (bank axis data-parallel): the
    batched Cholesky/UKF math partitions elementwise over the bank; the
    weight reductions and the resampling gather become psum/all-gather."""
    from gpu_se_tpu.filters import gs_ukf
    from gpu_se_tpu.filters.gs_ukf import GSUKFState

    m_sh = NamedSharding(mesh, P(PARTICLE_AXIS, None))
    c_sh = NamedSharding(mesh, P(PARTICLE_AXIS, None, None))
    w_sh = NamedSharding(mesh, P(PARTICLE_AXIS))
    r_sh = NamedSharding(mesh, P())
    state_sh = GSUKFState(means=m_sh, covariances=c_sh, weights=w_sh, key=r_sh)

    @partial(
        jax.jit,
        in_shardings=(state_sh, r_sh, r_sh, r_sh, None, None),
        out_shardings=state_sh,
    )
    def step(state, u, z, dt, state_pdf, measurement_pdf):
        from gpu_se_tpu.filters import resampling

        with resampling.impl("xla"):
            return gs_ukf.step(state, u, z, dt, f, g, state_pdf, measurement_pdf)

    return step


def make_shard_map_gsukf_step(mesh: Mesh, f: Callable, g: Callable,
                              axis: str = PARTICLE_AXIS):
    """Explicit shard_map GSUKF step: per-shard sigma-point predict/update
    (gs_ukf.predict_core/update_core) + distributed systematic resample of
    the (means, covariances) bank — the hand-scheduled analogue of the
    reference's GPU resample of both arrays
    (/root/reference/filter/gs_ukf.py:409-436). Sigma-point noise is drawn
    outside the shard_map with partitionable keys, so the result matches
    the single-device step under the identical key schedule."""
    from gpu_se_tpu.filters import gs_ukf
    from gpu_se_tpu.filters.gs_ukf import GSUKFState

    def step(state: GSUKFState, u, z, dt, state_pdf: GaussianSum,
             measurement_pdf: GaussianSum) -> GSUKFState:
        n, nx = state.means.shape
        key, k_noise, k_r = jax.random.split(state.key, 3)
        noise = state_pdf.draw(k_noise, (n, 2 * nx + 1))
        r = jax.random.uniform(k_r, ())

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(axis, None), P(axis, None, None), P(axis),
                P(), P(), P(), P(axis, None, None), P(),
            ),
            out_specs=(P(axis, None), P(axis, None, None), P(axis)),
            check_vma=False,
        )
        def sharded(means, covs, weights, u, z, dt, noise, r):
            means, covs = gs_ukf.predict_core(means, covs, u, dt, noise, f)
            means, covs, weights = gs_ukf.update_core(
                means, covs, weights, u, z, g, measurement_pdf
            )
            (means, covs), weights = _distributed_systematic_resample(
                (means, covs), weights, r, axis
            )
            return means, covs, weights

        means, covs, weights = sharded(
            state.means, state.covariances, state.weights, u, z,
            jnp.asarray(dt, state.means.dtype), noise, r,
        )
        return GSUKFState(means=means, covariances=covs, weights=weights, key=key)

    m_sh = NamedSharding(mesh, P(axis, None))
    c_sh = NamedSharding(mesh, P(axis, None, None))
    w_sh = NamedSharding(mesh, P(axis))
    r_sh = NamedSharding(mesh, P())
    state_shardings = GSUKFState(means=m_sh, covariances=c_sh, weights=w_sh, key=r_sh)
    return jax.jit(
        step,
        in_shardings=(state_shardings, r_sh, r_sh, None, None, None),
        out_shardings=state_shardings,
    )
