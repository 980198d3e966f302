"""Worker for the 2-process jax.distributed smoke test (run by
tests/test_multihost.py, one subprocess per simulated host).

Each process owns 2 virtual CPU devices; the global mesh spans 4. The
worker runs ONE explicit shard_map PF step on deterministic data and
prints the point estimate, which the parent compares across processes
and against a single-process reference.
"""
import os
import sys

PORT = sys.argv[1]
PROC_ID = int(sys.argv[2])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo_root)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{PORT}", num_processes=2, process_id=PROC_ID
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from gpu_se_tpu.distributions import GaussianSum  # noqa: E402
from gpu_se_tpu.filters import particle as pf_core  # noqa: E402
from gpu_se_tpu.filters.particle import PFState  # noqa: E402
from gpu_se_tpu.models import bioreactor as bio  # noqa: E402
from gpu_se_tpu.parallel import global_mesh, make_shard_map_step  # noqa: E402
from gpu_se_tpu.parallel.mesh import PARTICLE_AXIS  # noqa: E402

assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

N = 64
mesh = global_mesh()

# deterministic, process-identical rig (mirrors tests/test_sharding.py)
x_ss = np.array([280 / 180, 640 / 24.6, 1000 / 116, 0.0, 0.0])
state_pdf = GaussianSum.create(
    np.zeros((2, 5)),
    np.stack(
        [
            np.diag([1e-4, 1e-7, 1e-3, 1e-3, 1e-7]),
            np.diag([1e-3, 1e-6, 1e-2, 1e-2, 1e-6]),
        ]
    ),
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

rng = np.random.default_rng(0)
parts_np = (x_ss[None, :] + rng.normal(scale=1e-2, size=(N, 5))).astype(np.float32)
w_np = np.full((N,), 1.0 / N, np.float32)

p_sh = NamedSharding(mesh, P(PARTICLE_AXIS, None))
w_sh = NamedSharding(mesh, P(PARTICLE_AXIS))
r_sh = NamedSharding(mesh, P())
parts = jax.make_array_from_callback((N, 5), p_sh, lambda idx: parts_np[idx])
weights = jax.make_array_from_callback((N,), w_sh, lambda idx: w_np[idx])
key = jax.make_array_from_callback(
    (2,), r_sh, lambda idx: np.asarray(jax.random.PRNGKey(7))[idx]
)
state = PFState(particles=parts, weights=weights, key=key)

step = make_shard_map_step(mesh, f, g)
out = step(state, u, z, jnp.float32(0.1), state_pdf, meas_pdf)
est = jax.jit(pf_core.point_estimate, out_shardings=r_sh)(out)
est_np = np.asarray(est)
print("EST", PROC_ID, " ".join(f"{v:.8e}" for v in est_np), flush=True)
jax.distributed.shutdown()
