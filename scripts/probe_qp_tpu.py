"""Debug probe: the dt_control=1 rig MPC QP solves on CPU but returns
MAX_ITER_REACHED on TPU for the find_SS initial state (round-3 verify
finding). Prints status/iterations/residuals on the current backend.

Usage:
  env PYTHONPATH=/root/.axon_site:. python scripts/probe_qp_tpu.py   # TPU
  python scripts/probe_qp_tpu.py cpu                                 # CPU
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402


def main():
    from gpu_se_tpu.sim import get_parts

    print("platform:", jax.devices()[0].platform, flush=True)
    bioreactor, lin_model, K, _ = get_parts(dt_control=1.0, N_particles=2**8,
                                            pf=True)
    x0 = lin_model.xn2d(np.asarray(bioreactor.X))
    um1 = lin_model.un2d(np.array([0.06, 0.2]))
    y0 = lin_model.yn2d(np.asarray(bioreactor.outputs(np.array([0.06, 0.2]))))
    print("x0:", x0, "um1:", um1, "y0:", y0, flush=True)

    try:
        u = K.step(x0, um1, y0)
        print("step OK, u =", np.asarray(u), flush=True)
    except ValueError as e:
        print("step FAILED:", e, flush=True)
    sol = K.last_solution
    print(
        f"status={int(sol.status)} iters={int(sol.iterations)} "
        f"prim_res={float(sol.prim_res):.3e} dual_res={float(sol.dual_res):.3e}",
        flush=True,
    )
    x = np.asarray(sol.x)
    y = np.asarray(sol.y)
    print(f"|x|_inf={np.abs(x).max():.3e} |y|_inf={np.abs(y).max():.3e}",
          flush=True)


if __name__ == "__main__":
    main()
