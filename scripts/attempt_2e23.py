"""VERDICT r3 task 7: attempt a real-TPU data point at >= 2^23 particles.

Round-2/3 finding: remote AOT compile of the fused PF step hangs at
N >= 2^23 through the dev relay (2^20-2^22 compile in ~20-30 s; the
same program at 2^23 never returns and wedges the relay for everyone).
This script makes the prescribed workaround attempts, each in a
SUBPROCESS with a hard timeout so a hang cannot wedge the parent, and
records every outcome in results/artifacts/ATTEMPT_2E23.json:

  a. plain fused step (control — expected to hang/time out)
  b. split programs: predict+update only, then resample only
  c. donated buffers (jax.jit(..., donate_argnums))
  d. v4 tiled resample alone (the round-4 kernel, fewer XLA ops)

CAUTION: run at the END of a session — a timed-out compile may leave
the relay busy for minutes (CLAUDE.md relay-wedge protocol).

Usage: env PYTHONPATH=/root/.axon_site:. python scripts/attempt_2e23.py
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMEOUT_S = 420

CHILD = r"""
import os, sys, time
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_compilation_cache_dir", {root!r} + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from gpu_se_tpu.filters import particle as pf_core
from gpu_se_tpu.models import bioreactor as bio
from results._filter_bench import rig_dists

mode = {mode!r}
n = 2 ** 23
x_ss, x0, state_pdf, meas_pdf = rig_dists()
f = bio.Bioreactor.homeostatic_DEs
g = bio.Bioreactor.static_outputs
u = jnp.array([0.06, 0.2])
z = jnp.asarray(bio.static_outputs(x_ss, np.asarray(u), xp=np), jnp.float32)

t0 = time.time()
state = pf_core.init(jax.random.PRNGKey(int(time.time()) % 2**31), n, x0)
jax.block_until_ready(state.particles)
print(f"alloc+init {{time.time()-t0:.1f}}s", flush=True)

def run(step_fn, *args):
    t0 = time.time()
    out = step_fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    c = time.time() - t0
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = step_fn(*args if not isinstance(out, type(args[0])) else (out,) + args[1:])
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return c, (time.time() - t0) / reps

if mode == "plain":
    step = jax.jit(lambda s: pf_core.step(s, u, z, jnp.float32(0.1), f, g,
                                          state_pdf, meas_pdf))
    c, dt = run(step, state)
    print(f"RESULT plain compile={{c:.1f}}s step={{dt*1e3:.2f}}ms", flush=True)
elif mode == "split":
    pu = jax.jit(lambda s: pf_core.update(
        pf_core.predict(s, u, jnp.float32(0.1), f, state_pdf),
        u, z, g, meas_pdf))
    rs = jax.jit(pf_core.resample)
    c1, d1 = run(pu, state)
    c2, d2 = run(rs, state)
    print(f"RESULT split pu_compile={{c1:.1f}}s pu={{d1*1e3:.2f}}ms "
          f"rs_compile={{c2:.1f}}s rs={{d2*1e3:.2f}}ms", flush=True)
elif mode == "donate":
    step = jax.jit(lambda s: pf_core.step(s, u, z, jnp.float32(0.1), f, g,
                                          state_pdf, meas_pdf),
                   donate_argnums=(0,))
    t0 = time.time()
    out = step(state)
    jax.block_until_ready(out.particles)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = step(out)
    jax.block_until_ready(out.particles)
    print(f"RESULT donate compile={{c:.1f}}s step={{(time.time()-t0)/5*1e3:.2f}}ms",
          flush=True)
elif mode == "v4only":
    from gpu_se_tpu.ops.resample_pallas4 import pallas_systematic_resample_tiled
    w = jnp.exp(4.0 * jnp.tanh(state.particles[:, 0]) ** 2) + 1e-9
    fn = jax.jit(lambda p, w: pallas_systematic_resample_tiled(
        p, w, jnp.float32(0.37)))
    t0 = time.time()
    out, anc = fn(state.particles, w)
    jax.block_until_ready(out)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out, anc = fn(out, w)
    jax.block_until_ready(out)
    print(f"RESULT v4only compile={{c:.1f}}s op={{(time.time()-t0)/5*1e3:.2f}}ms",
          flush=True)
"""


def attempt(mode):
    src = CHILD.format(root=ROOT, mode=mode)
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, "-c", src], capture_output=True, text=True,
            timeout=TIMEOUT_S,
            env={**os.environ,
                 "PYTHONPATH": "/root/.axon_site:" + ROOT},
        )
        tail = "\n".join((out.stdout + out.stderr).splitlines()[-6:])
        return {"mode": mode, "status": "completed" if out.returncode == 0
                else f"error rc={out.returncode}",
                "wall_s": round(time.time() - t0, 1), "tail": tail}
    except subprocess.TimeoutExpired as e:
        tail = ((e.stdout or "") + (e.stderr or ""))
        if isinstance(tail, bytes):
            tail = tail.decode(errors="replace")
        return {"mode": mode, "status": f"TIMEOUT after {TIMEOUT_S}s "
                "(consistent with the known >=2^23 remote-compile hang)",
                "wall_s": round(time.time() - t0, 1),
                "tail": "\n".join(tail.splitlines()[-4:])}


def main():
    results = {"n": "2^23", "timeout_s": TIMEOUT_S,
               "context": "1x v5e via dev relay; round-3 record: remote "
                          "AOT compile of the fused PF step hangs at "
                          ">=2^23 (CLAUDE.md). The 'plain' control re-run "
                          "is opt-in (known hang, wedges the relay ~7 "
                          "min); the recorded attempts are the "
                          "prescribed workarounds.",
               "attempts": []}
    # "plain" (the fused-step control) is the round-3-documented hang;
    # re-running it costs a ~7-minute relay wedge for a known outcome —
    # opt in with `plain` on the command line.
    modes = sys.argv[1:] or ["v4only", "split", "donate"]
    for mode in modes:
        print(f"--- attempting {mode} ---", flush=True)
        res = attempt(mode)
        print(json.dumps(res, indent=1), flush=True)
        results["attempts"].append(res)
        if res["status"].startswith("TIMEOUT"):
            print("hang encountered; waiting 300 s for relay self-recovery",
                  flush=True)
            time.sleep(300)
    path = os.path.join(ROOT, "results", "artifacts", "ATTEMPT_2E23.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
