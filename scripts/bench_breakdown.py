"""Per-stage PF timing at 2^20 on the real TPU (chained inputs)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from results._filter_bench import build  # noqa: E402

N = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
REPS = 20


def bench(name, fn, state):
    s = fn(state)
    jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        s = fn(s)
    jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:12s} {dt:8.3f} ms", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
    state, ops = build("pf", N, gpu=True)
    for name in ["predict", "update", "resample", "step"]:
        bench(name, ops[name], state)


if __name__ == "__main__":
    main()
