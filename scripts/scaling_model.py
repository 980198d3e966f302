"""Multi-chip scaling-efficiency model for the sharded PF step (VERDICT
r3 task 4): the only defensible scaling evidence obtainable in a 1-chip
environment.

Two ingredients, both recorded in results/artifacts/SCALING_MODEL.json:

1. **Measured collective inventory.** The explicit shard_map PF step is
   compiled on the virtual 8-device CPU mesh and its optimized HLO is
   scanned for collectives (all-gather / collective-permute / all-reduce)
   with operand shapes, converted to per-step bytes over the interconnect.
   This pins the analytic model to what XLA actually emits rather than to
   reading of the source.

2. **Analytic per-chip time model.** v5e constants + the round-3 k-chain
   single-chip anchors (CALIBRATED_OPS.json):

   - predict+update: perfectly data-parallel, measured 0.65 ms at 2^20
     -> t_pu(n_local) = 0.65 ms * n_local / 2^20.
   - segmented cumsum: O(n_local) local scan + one (n/128,) f32
     all-gather of segment totals.
   - ancestor + gather rings: W ppermute rounds each rotating one
     O(n_local) block; per-chip ICI traffic is n*(4 + 4*rows) bytes PER
     STEP (independent of W: every block transits every chip — the ring
     trades bandwidth for O(n_local) memory). Ring *compute* per chip is
     k_eff * O(n_local): the sorted ancestor range of one chip overlaps
     ~1-3 visiting blocks and the lax.cond skips the rest; the scatter
     leg does O(n_local) work on every round (seed/count accumulation),
     so k_scatter = W.

   Known structural limit, stated rather than hidden: the ring's
   bandwidth term makes strong scaling of the *resample* flat in W; the
   step scales because predict+update and the local scans do. An
   all-to-all exchange (send only the 1-3 blocks a chip actually needs)
   would cut ICI bytes by ~W/3 and is the documented next lever past 8
   chips.

Usage: python scripts/scaling_model.py   (CPU-only; no TPU needed)
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

from jax.sharding import Mesh
from gpu_se_tpu.parallel.mesh import PARTICLE_AXIS
from gpu_se_tpu.parallel import sharded
from gpu_se_tpu.filters.particle import PFState
from gpu_se_tpu.sim.harness import get_noise
from gpu_se_tpu.models.bioreactor import homeostatic_des, static_outputs

# ---------------------------------------------------------------------
# v5e hardware constants (public spec sheet values; the effective-ICI
# figure is deliberately conservative for a 1-D ring using 2 of 4 links)
# ---------------------------------------------------------------------
HW = {
    "chip": "TPU v5e",
    "hbm_GBps": 819.0,
    "ici_links": 4,
    "ici_per_link_GBps": 50.0,          # 400 Gbps/link
    "ici_ring_effective_GBps": 90.0,    # 2 links usable in a 1-D ring, ~90% eff
    "note": "per-chip, bidirectional ring assumed on a 1-D mesh axis",
}

# round-3 k-chain single-chip anchors (CALIBRATED_OPS.json, scripts/probe_v7)
ANCHORS = {
    "predict_update_ms_at_2e20": 0.65,
    # local O(n) vector work rate implied by the cumsum/cummax measurements
    # (~free at 2^20 => bounded by HBM streaming of 3 passes over 4 MB)
    "local_scan_ms_at_2e20": 0.10,
    # sorted row gather (the per-block copy work in the gather ring)
    "sorted_gather_ms_at_2e20": 2.6,
    # scatter-seed leg of the ancestor ring per full pass (XLA scatter at
    # 2^20 measured 7.8 ms single-chip; the ring does the same total work
    # split over W rounds of n_local)
    "scatter_ms_at_2e20": 7.8,
}

N0 = 2 ** 20


def count_collectives(n_global: int, width: int = 8):
    """Compile the shard_map step on the virtual CPU mesh and inventory
    the collectives in the optimized HLO."""
    mesh = Mesh(np.array(jax.devices("cpu")[:width]), (PARTICLE_AXIS,))
    state_pdf, measurement_pdf = (d.dist for d in get_noise())
    step = sharded.make_shard_map_step(
        mesh, homeostatic_des, static_outputs, resample_impl="xla"
    )
    key = jax.random.PRNGKey(0)
    state = PFState(
        particles=jnp.zeros((n_global, 5), jnp.float32),
        weights=jnp.full((n_global,), 1.0 / n_global, jnp.float32),
        key=key,
    )
    state = sharded.shard_pf_state(state, mesh)
    u = jnp.asarray([0.06, 0.2], jnp.float32)
    z = jnp.asarray([280.0, 850.0], jnp.float32)
    lowered = jax.jit(step).lower(
        state, u, z, jnp.float32(0.1), state_pdf, measurement_pdf
    )
    hlo = lowered.compile().as_text()

    pat = re.compile(
        r"(\w[\w.-]*) = (\S+) (all-gather|collective-permute|all-reduce|"
        r"all-to-all|reduce-scatter)\(", re.M)
    shape_pat = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")
    dtype_bytes = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                   "pred": 1, "u8": 1, "bf16": 2, "s8": 1}
    inv = {}
    for _name, shape_s, kind in pat.findall(hlo):
        m = shape_pat.match(shape_s.split("{")[0])
        if m:
            dt, dims = m.groups()
            elems = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
            byts = elems * dtype_bytes.get(dt, 4)
        else:
            byts = 0
        # collective-permute inside the fori_loop rings executes W times
        # per step; the static HLO lists it once — record static counts
        # and let the analytic model supply the per-step multiplicity.
        key_ = kind
        inv.setdefault(key_, {"count": 0, "bytes_per_instance": []})
        inv[key_]["count"] += 1
        inv[key_]["bytes_per_instance"].append(byts)
    for v in inv.values():
        v["bytes_total_static"] = int(np.sum(v["bytes_per_instance"]))
        v["bytes_per_instance"] = sorted(
            int(b) for b in v["bytes_per_instance"])[::-1][:8]
    return inv


# measured single-chip full-step times with the round-4 v4 resample
# default (BIGN_BENCH.json) — the honest W=1 baseline; the ring model
# below describes the CURRENT sharded implementation, which still uses
# the scatter+cummax per-shard path
MEASURED_1CHIP_MS = {2 ** 20: 5.11, 2 ** 21: 9.64, 2 ** 22: 19.70,
                     2 ** 23: 39.28, 2 ** 24: 79.67}


def analytic_model(n_global: int, width: int, rows: int = 5):
    """Per-chip per-step milliseconds, by term."""
    if width == 1 and n_global in MEASURED_1CHIP_MS:
        t = MEASURED_1CHIP_MS[n_global]
        return {"n_global": n_global, "width": 1,
                "t_total_ms": t, "source": "measured (BIGN_BENCH, v4)"}
    nl = n_global / width
    scale = nl / N0
    t_pu = ANCHORS["predict_update_ms_at_2e20"] * scale
    t_scan = ANCHORS["local_scan_ms_at_2e20"] * scale
    # segment totals all-gather: (n/128,) f32 received from W-1 peers
    ag_bytes = (n_global / 128) * 4
    t_ag = ag_bytes / (HW["ici_ring_effective_GBps"] * 1e6)  # ms
    # rings: every chip forwards all W blocks of (nl,(rows+1)) f32+i32
    ring_bytes = n_global * 4 * (1 + rows)
    t_ring_comm = (ring_bytes / (HW["ici_ring_effective_GBps"] * 1e6)
                   if width > 1 else 0.0)
    # scatter leg: O(nl) seed work every round -> O(n) total per chip
    t_scatter = ANCHORS["scatter_ms_at_2e20"] * (n_global / N0) / width \
        + ANCHORS["scatter_ms_at_2e20"] * 0.15 * (n_global / N0) * (
            0 if width == 1 else 1)
    # gather leg: k_eff block visits do real copy work
    k_eff = 1.0 if width == 1 else 2.0
    t_gather = ANCHORS["sorted_gather_ms_at_2e20"] * scale * k_eff
    total = t_pu + t_scan + t_ag + t_ring_comm + t_scatter + t_gather
    return {
        "n_global": n_global, "width": width,
        "t_predict_update_ms": t_pu, "t_local_scan_ms": t_scan,
        "t_totals_allgather_ms": t_ag, "t_ring_comm_ms": t_ring_comm,
        "t_scatter_ms": t_scatter, "t_gather_ms": t_gather,
        "t_total_ms": total,
    }


def main():
    out = {
        "hardware_assumptions": HW,
        "single_chip_anchors": ANCHORS,
        "method": (
            "collective inventory measured from the 8-device CPU-mesh "
            "optimized HLO of make_shard_map_step (static counts; ring "
            "collective-permutes execute W times per step inside "
            "fori_loop); per-chip times from the analytic model pinned "
            "to round-3 k-chain single-chip slopes"
        ),
    }

    print("compiling shard_map step on the 8-device CPU mesh ...")
    out["hlo_collectives_2e20_w8"] = count_collectives(2 ** 20, 8)
    print(json.dumps(out["hlo_collectives_2e20_w8"], indent=1))

    # strong scaling at the reference's exercised scales
    curves = {}
    for n in (2 ** 22, 2 ** 23, 2 ** 24):
        rows = [analytic_model(n, w) for w in (1, 2, 4, 8)]
        t1 = rows[0]["t_total_ms"]
        for r in rows:
            r["speedup_vs_1chip"] = t1 / r["t_total_ms"]
            r["parallel_efficiency"] = r["speedup_vs_1chip"] / r["width"]
        curves[f"2^{int(np.log2(n))}"] = rows
    out["strong_scaling"] = curves

    # weak scaling: n_local = 2^20 per chip
    weak = []
    for w in (1, 2, 4, 8):
        r = analytic_model(2 ** 20 * w, w)
        r["weak_efficiency"] = (
            analytic_model(2 ** 20, 1)["t_total_ms"] / r["t_total_ms"]
        )
        weak.append(r)
    out["weak_scaling_nlocal_2e20"] = weak

    e23 = {r["width"]: r["parallel_efficiency"] for r in curves["2^23"]}
    ew = {r["width"]: r["weak_efficiency"] for r in weak}
    out["honest_conclusions"] = [
        "predict+update and the local scans scale ~1/W; the resample's "
        "ring terms do not (every block transits every chip), so "
        "modeled strong-scaling efficiency at 2^23 is "
        f"{e23[2]:.2f} at W=2, {e23[4]:.2f} at W=4, {e23[8]:.2f} at "
        "W=8 — BELOW the BASELINE >80% aspiration for the step as a "
        "whole. Weak scaling (fixed 2^20/chip) holds "
        f"{ew[2]:.2f}/{ew[4]:.2f}/{ew[8]:.2f} at W=2/4/8.",
        "the defensible multi-chip claims are therefore: (a) memory "
        "scalability — O(n/W) live bytes/chip for the n beyond any "
        "single chip's HBM (one v5e now RUNS 2^24 at 79.7 ms/step "
        "since round 4, so the single-chip envelope ends at HBM "
        "capacity ~2^26, not compile limits), and (b) near-linear "
        "scaling of the predict+update FLOPs; NOT strong-scaling of "
        "the resample on the current ring — beating the measured v4 "
        "single-chip numbers needs the v4 kernel ported into the "
        "per-shard merge (documented next lever).",
        "documented next lever: replace the gather ring with an "
        "all-to-all exchange of only the ~2-3 blocks each chip's sorted "
        "ancestor range overlaps (cuts ICI bytes by ~W/3), and port the "
        "v4 jumbo-window kernel into the per-shard merge.",
        "model, not measurement: no multi-chip hardware is reachable "
        "from this environment (1x v5e via relay); the collective "
        "inventory is real (compiled HLO), the times are modeled from "
        "round-3 single-chip k-chain anchors.",
    ]

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "artifacts", "SCALING_MODEL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    for nm, rows in curves.items():
        print(nm, [f"W={r['width']}: {r['t_total_ms']:.2f}ms "
                   f"eff={r['parallel_efficiency']:.2f}" for r in rows])


if __name__ == "__main__":
    main()
