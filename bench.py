"""Benchmark: batched UR10 IK throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Metric: successful IK solves/sec/chip - throughput multiplied by the success
rate at the BASELINE criterion (pos err < 1 mm, rot err < 1 deg, joint/
obstacle limits feasible). The baseline denominator is the BASELINE.json
target of 10k solves/sec on a v5e-8, i.e. 1250 solves/sec/chip.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PER_CHIP = 1250.0  # 10k/s on v5e-8 (BASELINE.md)


T_START = time.perf_counter()


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/graphik_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from graphik_tpu import api
    from graphik_tpu.parallel.mesh import summarize
    from graphik_tpu.robots.library import load_ur10
    from graphik_tpu.solvers.riemannian import TRParams

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    maxiter = int(os.environ.get("BENCH_MAXITER", "400"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    tpl, ps = load_ur10()
    params = TRParams(maxiter=maxiter)

    solver = api.solve_ik_jit(ps, params=params)
    t_setup = time.perf_counter()
    print(f"[bench] setup done t={t_setup - T_START:.1f}s", file=sys.stderr, flush=True)

    key = jax.random.PRNGKey(0)
    T_goal, _ = api.random_goals(ps, key, (batch,))
    T_goal = jnp.asarray(T_goal)

    def sync(tree):
        # Forcing a host transfer guarantees completion even where the
        # platform's block_until_ready is asynchronous (axon tunnel).
        jax.block_until_ready(tree)
        np.asarray(jax.tree_util.tree_leaves(tree)[0])

    # Warmup / compile
    out = solver(T_goal)
    sync(out)
    print(f"[bench] warmup+compile done t={time.perf_counter() - T_START:.1f}s",
          file=sys.stderr, flush=True)

    times = []
    for r in range(reps):
        kr = jax.random.PRNGKey(r + 1)
        Tg, _ = api.random_goals(ps, kr, (batch,))
        Tg = jnp.asarray(Tg)
        sync(Tg)
        t0 = time.perf_counter()
        out = solver(Tg)
        sync(out)
        times.append(time.perf_counter() - t0)
        print(f"[bench] rep {r} took {times[-1]:.1f}s", file=sys.stderr, flush=True)

    t = min(times)
    stats = {k: float(v) for k, v in summarize(out).items()}
    throughput = batch / t
    effective = throughput * stats["success_rate"]

    n_dev = jax.device_count()
    result = {
        "metric": "ur10_successful_solves_per_sec_per_chip",
        "value": round(effective / n_dev, 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(effective / n_dev / BASELINE_PER_CHIP, 4),
        "throughput_solves_per_sec": round(throughput, 2),
        "success_rate": round(stats["success_rate"], 4),
        "pose_only_rate": round(stats["pose_only_rate"], 4),
        "batch": batch,
        "maxiter": maxiter,
        "wall_s": round(t, 4),
        "mean_iterations": round(stats["mean_iterations"], 1),
        "device": str(jax.devices()[0]),
        "n_devices": n_dev,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
