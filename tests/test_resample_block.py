"""Block-merge Pallas resample kernel (ops/resample_pallas_block.py):
single-block equivalence with the XLA formulation, and the sharded
kernel path's bitwise agreement with the XLA ring on the 8-device CPU
mesh (interpret mode) — the composition VERDICT round 2 asked for: the
fused kernel usable under shard_map (task 3)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from gpu_se_tpu.filters.resampling import (
    sorted_row_gather,
    systematic_resample_indices,
)
from gpu_se_tpu.ops.resample_pallas_block import (
    block_resample_state,
    pallas_block_resample_round,
)
from gpu_se_tpu.parallel.mesh import PARTICLE_AXIS, make_mesh
from gpu_se_tpu.parallel.sharded import (
    _distributed_systematic_resample,
    _distributed_systematic_resample_kernel,
)


def _ends_single(w, r):
    n = w.shape[0]
    cs = jnp.cumsum(w)
    cs = cs / cs[-1]
    ends = jnp.floor(n * cs - r).astype(jnp.int32)
    return jnp.clip(jax.lax.cummax(ends), -1, n - 1)


@pytest.mark.parametrize("seed,skew,r", [(0, 4.0, 0.3), (1, 12.0, 0.77),
                                         (2, 0.001, 0.0), (3, 4.0, 0.999)])
def test_single_block_matches_xla_indices(seed, skew, r):
    """W=1 special case: one call over the whole array reproduces the XLA
    scatter+cummax ancestors and the gathered rows exactly (integer
    merge domain — equality is by construction, not up to rounding)."""
    n = 2 ** 12
    rng = np.random.default_rng(seed)
    parts = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)
    w = jnp.exp(skew * jnp.tanh(parts[:, 0]) ** 2)
    r = jnp.float32(r)

    idx = systematic_resample_indices(w, r)
    out_x = sorted_row_gather(parts, idx)

    counts, acc, fin = block_resample_state(n)
    counts, acc, fin = pallas_block_resample_round(
        _ends_single(w, r), parts, 0, counts, acc, fin, 128, 256,
        interpret=True,
    )
    anc = jnp.clip(counts[:, 0], 0, n - 1)
    np.testing.assert_array_equal(np.asarray(anc), np.asarray(idx))
    np.testing.assert_array_equal(np.asarray(acc[:, :5]), np.asarray(out_x))
    assert bool(jnp.all(fin > 0.5))


def _build_sharded(mesh, impl):
    @jax.jit
    def res(parts, w, r):
        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(PARTICLE_AXIS, None), P(PARTICLE_AXIS), P()),
            out_specs=(P(PARTICLE_AXIS, None), P(PARTICLE_AXIS)),
            check_vma=False,
        )
        def body(parts, w, r):
            if impl == "xla":
                return _distributed_systematic_resample(
                    parts, w, r, PARTICLE_AXIS
                )
            return _distributed_systematic_resample_kernel(
                parts, w, r, PARTICLE_AXIS, interpret=True
            )
        return body(parts, w, r)
    return res


@pytest.mark.parametrize("skew,r", [(4.0, 0.3), (12.0, 0.77), (0.001, 0.0),
                                    (25.0, 0.999), (0.0, 0.5)])
def test_sharded_kernel_matches_xla_ring_bitwise(skew, r):
    """Width 8, interpret mode: the kernel protocol (ascending psum
    broadcast + carried merge state) is bitwise-equal to the XLA ring
    (scatter + ppermute rings) — both consume the same width-invariant
    integer ``ends`` blocks."""
    n = 2 ** 13
    mesh = make_mesh(8)
    p_sh = NamedSharding(mesh, P(PARTICLE_AXIS, None))
    w_sh = NamedSharding(mesh, P(PARTICLE_AXIS))
    parts = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(int(skew * 10)), (n, 5),
                          jnp.float32), p_sh
    )
    w = jax.device_put(jnp.exp(skew * jnp.tanh(parts[:, 0]) ** 2), w_sh)
    r = jnp.float32(r)

    out_x, w_x = _build_sharded(mesh, "xla")(parts, w, r)
    out_k, w_k = _build_sharded(mesh, "kernel")(parts, w, r)
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(out_x))
    np.testing.assert_array_equal(np.asarray(w_k), np.asarray(w_x))


def test_sharded_kernel_adversarial_single_heavy_particle():
    """All mass on one particle in the middle shard: every output slot
    sources one row from one block — the broadcast protocol's worst-case
    skew — and still matches the XLA ring bitwise."""
    n = 2 ** 12
    mesh = make_mesh(8)
    p_sh = NamedSharding(mesh, P(PARTICLE_AXIS, None))
    w_sh = NamedSharding(mesh, P(PARTICLE_AXIS))
    parts = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(9), (n, 5), jnp.float32), p_sh
    )
    w_np = np.full((n,), 1e-12, np.float32)
    w_np[n // 2 + 37] = 1.0
    w = jax.device_put(jnp.asarray(w_np), w_sh)
    r = jnp.float32(0.25)

    out_x, _ = _build_sharded(mesh, "xla")(parts, w, r)
    out_k, _ = _build_sharded(mesh, "kernel")(parts, w, r)
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(out_x))


def test_full_step_kernel_impl_matches_xla_impl():
    """make_shard_map_step(resample_impl='kernel_interpret') == the 'xla'
    impl bitwise, through the full predict/update/resample step."""
    from gpu_se_tpu.distributions import GaussianSum
    from gpu_se_tpu.filters import particle as pf_core
    from gpu_se_tpu.models import bioreactor as bio
    from gpu_se_tpu.parallel import make_shard_map_step, shard_pf_state

    n = 2 ** 12
    x_ss = np.array([280 / 180, 640 / 24.6, 1000 / 116, 0.0, 0.0])
    x0 = GaussianSum.create(
        np.stack([x_ss, x_ss]),
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
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    state = pf_core.init(jax.random.PRNGKey(4), n, x0)

    mesh = make_mesh(8)
    outs = []
    for impl in ("xla", "kernel_interpret"):
        step = make_shard_map_step(mesh, f, g, resample_impl=impl)
        out = step(
            shard_pf_state(state, mesh), u, z, jnp.float32(0.1),
            state_pdf, meas_pdf,
        )
        outs.append(np.asarray(out.particles))
    np.testing.assert_array_equal(outs[0], outs[1])
    assert np.isfinite(outs[0]).all()


@pytest.mark.parametrize("b,w", [(128, 256), (256, 256), (256, 128),
                                 (512, 512)])
def test_ends_wrapper_geometries(b, w):
    """Single-chip ends-domain wrapper (sync and pipelined) is bitwise
    equal to the XLA formulation across kernel geometries."""
    from gpu_se_tpu.ops.resample_pallas_block import (
        pallas_systematic_resample_ends,
    )

    n = 2 ** 12
    rng = np.random.default_rng(b + w)
    parts = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)
    wts = jnp.exp(6.0 * jnp.tanh(parts[:, 0]) ** 2)
    r = jnp.float32(0.63)
    idx = systematic_resample_indices(wts, r)
    out_x = sorted_row_gather(parts, idx)
    for pipelined in (False, True):
        out, anc = pallas_systematic_resample_ends(
            parts, wts, r, b, w, interpret=True, pipelined=pipelined
        )
        np.testing.assert_array_equal(np.asarray(anc), np.asarray(idx))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out_x))


def test_pipelined_round_matches_sync_round_multiblock():
    """The pipelined block round advances the carried state identically
    to the sync round when fed ascending blocks of a split pool."""
    from gpu_se_tpu.ops.resample_pallas_block import (
        pallas_block_resample_round_pipelined,
    )

    n, n_blocks = 2 ** 12, 4
    n_blk = n // n_blocks
    rng = np.random.default_rng(5)
    parts = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)
    w = jnp.exp(8.0 * jnp.tanh(parts[:, 0]) ** 2)
    r = jnp.float32(0.41)
    ends = _ends_single(w, r)
    idx = systematic_resample_indices(w, r)
    out_x = sorted_row_gather(parts, idx)

    states = {
        "sync": block_resample_state(n),
        "pipe": block_resample_state(n),
    }
    for q in range(n_blocks):
        sl = slice(q * n_blk, (q + 1) * n_blk)
        states["sync"] = pallas_block_resample_round(
            ends[sl], parts[sl], 0, *states["sync"], 128, 256, interpret=True
        )
        states["pipe"] = pallas_block_resample_round_pipelined(
            ends[sl], parts[sl], 0, *states["pipe"], 128, 256, interpret=True
        )
    for name, (counts, acc, fin) in states.items():
        anc = jnp.clip(counts[:, 0], 0, n - 1)
        np.testing.assert_array_equal(np.asarray(anc), np.asarray(idx),
                                      err_msg=name)
        np.testing.assert_array_equal(np.asarray(acc[:, :5]),
                                      np.asarray(out_x), err_msg=name)


def test_gsukf_packed_payload_single_chip():
    """The ends kernel resamples the packed (means, covariances) bank —
    impl('ends_interpret') == impl('xla') bitwise on a GSUKF pytree."""
    from gpu_se_tpu.filters import resampling

    n = 2 ** 12
    key = jax.random.PRNGKey(21)
    means = jax.random.normal(key, (n, 5), jnp.float32)
    covs = jax.random.normal(jax.random.PRNGKey(22), (n, 5, 5), jnp.float32)
    w = jnp.exp(5.0 * jnp.tanh(means[:, 0]) ** 2)
    kr = jax.random.PRNGKey(23)

    with resampling.impl("xla"):
        (rm, rc), rw = resampling.systematic_resample((means, covs), w, kr)
    with resampling.impl("ends_interpret"):
        (om, oc), ow = resampling.systematic_resample((means, covs), w, kr)
    np.testing.assert_array_equal(np.asarray(om), np.asarray(rm))
    np.testing.assert_array_equal(np.asarray(oc), np.asarray(rc))
    np.testing.assert_array_equal(np.asarray(ow), np.asarray(rw))


def test_gsukf_sharded_kernel_matches_xla_ring():
    """make_shard_map_gsukf_step(resample_impl='kernel_interpret') ==
    'xla' bitwise through the full sharded GSUKF step at width 8."""
    from gpu_se_tpu.distributions import GaussianSum
    from gpu_se_tpu.filters import gs_ukf
    from gpu_se_tpu.models import bioreactor as bio
    from gpu_se_tpu.parallel import make_shard_map_gsukf_step, shard_gsukf_state

    n = 2 ** 10
    x_ss = np.array([280 / 180, 640 / 24.6, 1000 / 116, 0.0, 0.0])
    x0 = GaussianSum.create(
        np.stack([x_ss, x_ss]),
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
    f = bio.Bioreactor.homeostatic_DEs
    g = bio.Bioreactor.static_outputs
    u = jnp.array([0.06, 0.2])
    z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)
    state = gs_ukf.init(jax.random.PRNGKey(6), n, x0, state_pdf)

    mesh = make_mesh(8)
    outs = []
    for impl in ("xla", "kernel_interpret"):
        step = make_shard_map_gsukf_step(mesh, f, g, resample_impl=impl)
        out = step(
            shard_gsukf_state(state, mesh), u, z, jnp.float32(0.1),
            state_pdf, meas_pdf,
        )
        outs.append((np.asarray(out.means), np.asarray(out.covariances)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
