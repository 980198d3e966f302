"""First-principles bound on the reference pipeline's GTX-1070 step time
at 2^20 particles, vs the measured v5e step (VERDICT round-2 task 4b).

The reference publishes no absolute numbers (SURVEY.md section 6), so
BASELINE.md's ">=10x GTX-1070 per chip" needs a defensible estimate of
what the reference's own CUDA pipeline could do on its own hardware
(GTX 1070: 256 GB/s GDDR5, ~6.5 TF/s f32, CUDA 10.2 era). We bound it
three ways from the op structure of
/root/reference/filter/particle.py:265-316 and write the bracket plus
the measured v5e numbers to results/artifacts/GTX1070_BOUND.json.

Byte accounting at N=2^20, Nx=5, f32 (particle pool = 21 MB):

predict (particle.py:265-277)
  f_vectorize guvectorize kernel: r 21 + w 21; `particles +=`: r 42 w 21
  mixture draw (MultivariateGaussianSum.py:65-97): 2x multivariate_normal
    (standard normals w 21, L matmul r+w 42, mean add), choice+bincount
    ~8, concat r+w 42        => ~105 + ~115 MB, + ~10.5e6 cuRAND normals
  noise add: r 42 w 21       => ~63 MB
update (particle.py:279-294)
  g kernel r 21 w 8.4; residual ~25; batched mixture pdf matmuls + exp
  ~100; weight multiply ~12  => ~165 MB
resample (particle.py:296-316)
  torch cumsum via dlpack r+w 8; normalize 8; Nicely kernel r ~4 (+
  drift) w 4; sorted-ish gather r 21*1.6 (20 B rows vs 32 B sectors)
  w 21                       => ~100 MB

Scenarios:
  speed_of_light: perfectly fused pipeline, minimal passes (~150 MB) +
    cuRAND at 40 Gnormal/s. What no implementation of this op structure
    can beat on the card.
  realistic: the byte accounting above (~550 MB), cuRAND at 15
    Gnormal/s, ~18 kernel launches x 7 us. A well-tuned version of the
    reference's actual structure.
  as_written: adds the measured-class overheads of the reference's
    Python dispatch chain (numba gufunc wrappers, cupy<->torch dlpack
    hops, per-step allocations) at ~50 us x ~20 dispatch points +
    cupy multivariate_normal's per-draw SVD setup — the pipeline as it
    actually runs from Python.
"""
import json
import os

GB = 1e9
BW_1070 = 256e9  # B/s
LAUNCH = 7e-6  # s per kernel launch (CUDA 10 era, small kernels)
PY_DISPATCH = 50e-6  # s per python->CUDA dispatch point in the hot loop

N = 2**20
NORMALS = N * 5 * 2  # two mixture components drawn at full N each

SCEN = {
    "speed_of_light": dict(bytes=150e6, rng_rate=40e9, launches=4,
                           py_dispatch=0),
    "realistic": dict(bytes=550e6, rng_rate=15e9, launches=18,
                      py_dispatch=0),
    "as_written": dict(bytes=550e6, rng_rate=15e9, launches=18,
                       py_dispatch=20),
}


def step_time(s):
    return (
        s["bytes"] / BW_1070
        + NORMALS / s["rng_rate"]
        + s["launches"] * LAUNCH
        + s["py_dispatch"] * PY_DISPATCH
    )


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {
        "n_particles": N,
        "gtx1070": {
            k: {
                "step_ms": round(step_time(s) * 1e3, 3),
                "steps_per_s": round(1.0 / step_time(s), 1),
                **{kk: vv for kk, vv in s.items()},
            }
            for k, s in SCEN.items()
        },
        "v5e_measured": {},
        "verdict": {},
    }

    bench_path = None
    for cand in ("BENCH_r04.json", "BENCH_r03.json", "BENCH_r02.json"):
        bench_path = os.path.join(root, cand)
        if os.path.exists(bench_path):
            break
    with open(bench_path) as fh:
        bench = json.load(fh)
    wall_steps = bench["parsed"]["value"] if "parsed" in bench else bench["value"]
    out["v5e_measured"] = {
        "wall_steps_per_s_chained": wall_steps,
        "source": os.path.basename(bench_path),
        "device_step_ms_calibrated": None,  # filled by refresh after probes
    }
    cal_path = os.path.join(root, "results", "artifacts", "CALIBRATED_OPS.json")
    if os.path.exists(cal_path):
        with open(cal_path) as fh:
            cal = json.load(fh)
        dev_ms = cal.get("pf_full_step_2e20", {}).get("device_ms")
        out["v5e_measured"]["device_step_ms_calibrated"] = dev_ms
        out["v5e_measured"]["calibration_method"] = cal.get(
            "pf_full_step_2e20", {}).get("method", "k-chain slope")
        if dev_ms:
            for k in SCEN:
                ref_ms = out["gtx1070"][k]["step_ms"]
                out["verdict"][f"x_vs_{k}"] = round(ref_ms / dev_ms, 2)
            xs = out["verdict"]["x_vs_as_written"]
            out["verdict"]["summary"] = (
                f"v5e device step {dev_ms} ms vs the as-written 1070 "
                f"estimate {out['gtx1070']['as_written']['step_ms']} ms: "
                f"{xs}x the estimated 1070 on this op. Round 4's v4 "
                "tiled resample (jumbo windows + exact one-hot slab "
                "matmuls + degenerate-weights compaction) removed the "
                "per-pipeline-unit kernel tax that capped round 3 at "
                "0.42x; predict+update remains ~0.7-0.8 ms vs the "
                "1070's ~1.4 ms estimate.")
            out["verdict"]["honest_claim"] = (
                ">=60x vs the regenerated CPU reference stands; per "
                "chip the build now brackets the as-written 1070 "
                f"estimate at {xs}x (speed-of-light 1070 comparison "
                "remains out of reach for a bandwidth-bound op, see "
                "notes); the >=10x axis remains multi-chip scaling "
                "(parallel/sharded.py + SCALING_MODEL.json).")

    out["notes"] = [
        "The 1070's bandwidth is 256 GB/s vs v5e's ~819 GB/s: on a "
        "bandwidth-bound op the per-chip speed-of-light ratio is ~3.2x, "
        "so '>=10x per chip' is only reachable against the reference's "
        "as-written pipeline (python dispatch + dlpack hops), not "
        "against an ideal 1070 implementation; beyond that, the >=10x "
        "axis is multi-chip scaling (parallel/sharded.py).",
        "No physical GTX 1070 exists in this environment; the bracket "
        "above is the defensible substitute the round-2 verdict asked "
        "for (BASELINE.md targets table).",
    ]

    path = os.path.join(root, "results", "artifacts", "GTX1070_BOUND.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["gtx1070"], indent=1))
    print("->", path)


if __name__ == "__main__":
    main()
