"""Multi-host smoke test: 2 CPU processes under ``jax.distributed``
running one explicit shard_map PF step over a 4-device global mesh
(SURVEY.md §7 step 8 — the capability the reference lacks entirely).

Exercises ``parallel/distributed.py`` in anger: coordinator handshake,
global mesh spanning both processes, cross-process collectives inside the
distributed systematic resample, and agreement with a single-process
reference under the identical key schedule.
"""
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 64


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same rig/key schedule as tests/_multihost_worker.py on this
    process's own (8-device) mesh — shard-invariance makes widths agree."""
    from gpu_se_tpu.distributions import GaussianSum
    from gpu_se_tpu.filters import particle as pf_core
    from gpu_se_tpu.filters.particle import PFState
    from gpu_se_tpu.models import bioreactor as bio
    from gpu_se_tpu.parallel import make_mesh, make_shard_map_step, shard_pf_state

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
    parts_np = (x_ss[None, :] + rng.normal(scale=1e-2, size=(N, 5))).astype(
        np.float32
    )
    state = PFState(
        particles=jnp.asarray(parts_np),
        weights=jnp.full((N,), 1.0 / N, jnp.float32),
        key=jax.random.PRNGKey(7),
    )
    mesh = make_mesh(4)
    step = make_shard_map_step(mesh, f, g)
    out = step(shard_pf_state(state, mesh), u, z, jnp.float32(0.1),
               state_pdf, meas_pdf)
    return np.asarray(pf_core.point_estimate(out))


def test_two_process_distributed_pf_step():
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_multihost_worker.py"),
             str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    ests = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("EST "):
                _, pid, *vals = line.split()
                ests[int(pid)] = np.array([float(v) for v in vals])
    assert set(ests) == {0, 1}, outs

    # both processes see the same replicated estimate
    np.testing.assert_allclose(ests[0], ests[1], rtol=1e-6, atol=1e-7)
    # and it matches the single-process run under the same key schedule
    ref = _single_process_reference()
    np.testing.assert_allclose(ests[0], ref, rtol=2e-5, atol=1e-6)
