"""Benchmark: batched IK throughput over the BASELINE config matrix.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "configs": {...}}

Headline metric: successful UR10 IK solves/sec/chip - throughput times the
success rate at the BASELINE criterion (pos err < 1 mm, rot err < 1 deg,
joint/obstacle limits feasible). Baseline denominator: the BASELINE.json
target of 10k solves/sec on a v5e-8, i.e. 1250 solves/sec/chip.

The "configs" field carries one entry per BASELINE.md parity config
(planar 6/10-DoF, UR10, KUKA IIWA, LWA4D, UR10+table obstacles, UR10 with
4 restarts, CIDGIK), each with throughput, success rate, and p50 latency
(wall time of a 128-instance quantum).

Env overrides: BENCH_BATCH, BENCH_MAXITER, BENCH_MAXINNER, BENCH_REPS,
BENCH_CONFIGS (comma-separated subset).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PER_CHIP = 1250.0  # 10k/s on v5e-8 (BASELINE.md)

T_START = time.perf_counter()


def log(msg):
    print(f"[bench] {msg} t={time.perf_counter() - T_START:.1f}s",
          file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/graphik_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from graphik_tpu import api
    from graphik_tpu.parallel.mesh import make_restart_solver, summarize
    from graphik_tpu.robots import library
    from graphik_tpu.solvers.riemannian import TRParams
    from graphik_tpu.utils.environments import table_environment

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    maxiter = int(os.environ.get("BENCH_MAXITER", "400"))
    # tCG budget 24: success 0.859 (>=95% of the f64 parity denominator
    # 0.90) at 6.2k solves/s; 48 adds +0.3% success for -32% throughput.
    maxinner = int(os.environ.get("BENCH_MAXINNER", "24"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    lat_batch = 128

    params = TRParams(maxiter=maxiter, maxinner=maxinner)
    n_dev = jax.device_count()

    def sync(tree):
        # A host transfer guarantees completion even where the platform's
        # block_until_ready is asynchronous (axon tunnel).
        jax.block_until_ready(tree)
        np.asarray(jax.tree_util.tree_leaves(tree)[0])

    def build(name):
        base = name.split("_restarts")[0].replace("_cidgik", "")
        if base == "planar6":
            return library.load_planar_chain(6, limits=np.pi / 2)[1]
        if base == "planar10":
            return library.load_planar_chain(10, limits=np.pi / 2)[1]
        if base == "ur10":
            return library.load_ur10()[1]
        if base == "kuka_iiwa":
            return library.load_kuka()[1]
        if base == "lwa4d":
            return library.load_schunk_lwa4d()[1]
        if base == "ur10_table":
            from graphik_tpu.graphs.problem import ProblemStructure

            tpl = library.load_ur10()[0]
            return ProblemStructure.from_template(
                tpl, obstacles=table_environment()
            )
        raise ValueError(name)

    def run_riemannian(ps, B, restarts=0):
        key = jax.random.PRNGKey(0)
        T_goal, _ = api.random_goals(ps, key, (B,))
        T_goal = jnp.asarray(T_goal)
        sync(T_goal)

        if restarts:
            rsolver = make_restart_solver(ps, n_restarts=restarts, params=params)
            solver = lambda Tg, k=jax.random.PRNGKey(7): rsolver(Tg, k)
        else:
            solver = api.make_solver(ps, params=params)

        t0 = time.perf_counter()
        out = solver(T_goal)
        sync(out)
        compile_s = time.perf_counter() - t0

        times = []
        for r in range(reps):
            Tg, _ = api.random_goals(ps, jax.random.PRNGKey(r + 1), (B,))
            Tg = jnp.asarray(Tg)
            sync(Tg)
            t0 = time.perf_counter()
            out = solver(Tg)
            sync(out)
            times.append(time.perf_counter() - t0)
        wall = min(times)
        stats = {k: float(v) for k, v in summarize(out).items()}

        # p50 latency: wall time of a small serving quantum.
        Tg_s, _ = api.random_goals(ps, jax.random.PRNGKey(99), (lat_batch,))
        Tg_s = jnp.asarray(Tg_s)
        sync(Tg_s)
        lat = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(solver(Tg_s))
            lat.append(time.perf_counter() - t0)
        return {
            "throughput_solves_per_sec": round(B / wall, 2),
            "success_rate": round(stats["success_rate"], 4),
            "effective_solves_per_sec": round(
                B / wall * stats["success_rate"], 2
            ),
            "pose_only_rate": round(stats["pose_only_rate"], 4),
            "mean_iterations": round(stats["mean_iterations"], 1),
            "wall_s": round(wall, 4),
            "batch": B,
            "compile_s": round(compile_s, 1),
            "p50_latency_ms_b128": round(float(np.median(lat)) * 1e3, 1),
        }

    def run_cidgik(ps, B):
        from graphik_tpu.solvers import cidgik as cd
        from graphik_tpu.solvers.cidgik import CidgikParams

        cparams = CidgikParams(admm_iters=800, max_outer=8)
        comp = cd.compile_cidgik(ps)
        key = jax.random.PRNGKey(0)
        T_goal, q_goal = api.random_goals(ps, key, (B,))
        T_goal = jnp.asarray(T_goal)
        sync(T_goal)

        # f32 ADMM lands in the right basin at ~cm accuracy; the GN polish
        # provides the final precision the reference gets from MOSEK's 1e-6
        # interior point (sdp_formulations.py:9-43). Stage-jitted: the
        # monolithic ADMM+polish program is over XLA's compile-time cliff.
        @jax.jit
        def stage_admm(Tg):
            return cd.solve_cidgik(comp, Tg, params=cparams)["q"]

        @jax.jit
        def stage_finish(q0, Tg):
            e_pos0, e_rot0 = api.pose_error(ps, q0, Tg)
            viol, ok = ps.check_distance_limits(ps.realization(q0))
            q, e_pos, e_rot, viol, ok = api.polish_solution(
                ps, q0, Tg, e_pos0, e_rot0, viol, ok
            )
            return e_pos0, e_rot0, e_pos, e_rot

        def solver(Tg):
            return stage_finish(stage_admm(Tg), Tg)
        t0 = time.perf_counter()
        out = solver(T_goal)
        sync(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = solver(T_goal)
        sync(out)
        wall = time.perf_counter() - t0
        e_pos0, e_rot0, e_pos, e_rot = (np.asarray(x) for x in out)
        raw = (e_pos0 < 1e-2) & (e_rot0 < 1e-2)
        hit = (e_pos < 1e-2) & (e_rot < 1e-2)
        mm = (e_pos < 1e-3) & (e_rot < np.deg2rad(1.0))
        return {
            "throughput_solves_per_sec": round(B / wall, 2),
            "success_rate_1cm": round(float(hit.mean()), 4),
            "success_rate_1mm": round(float(mm.mean()), 4),
            "raw_admm_rate_1cm": round(float(raw.mean()), 4),
            "wall_s": round(wall, 4),
            "batch": B,
            "compile_s": round(compile_s, 1),
        }

    all_configs = [
        "planar6", "planar10", "ur10", "kuka_iiwa", "lwa4d",
        "ur10_table", "planar6_restarts2", "planar10_restarts2",
        "ur10_restarts4", "ur10_table_restarts2", "ur10_cidgik",
    ]
    sel = os.environ.get("BENCH_CONFIGS")
    configs = sel.split(",") if sel else all_configs

    results = {}
    for name in configs:
        ps = build(name)
        log(f"config {name}: start")
        try:
            if name.endswith("_cidgik"):
                results[name] = run_cidgik(ps, min(batch, 256))
            elif "_restarts" in name:
                r = int(name.split("_restarts")[1])
                results[name] = run_riemannian(ps, batch // r, restarts=r)
            else:
                results[name] = run_riemannian(ps, batch)
            log(f"config {name}: done {results[name]}")
        except Exception as exc:  # keep the bench line even if one config dies
            results[name] = {"error": f"{type(exc).__name__}: {exc}"}
            log(f"config {name}: FAILED {exc}")

    head = results.get("ur10", {})
    effective = head.get("effective_solves_per_sec", 0.0)
    result = {
        "metric": "ur10_successful_solves_per_sec_per_chip",
        "value": round(effective / n_dev, 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(effective / n_dev / BASELINE_PER_CHIP, 4),
        "throughput_solves_per_sec": head.get("throughput_solves_per_sec"),
        "success_rate": head.get("success_rate"),
        "batch": batch,
        "maxiter": maxiter,
        "maxinner": maxinner,
        "device": str(jax.devices()[0]),
        "n_devices": n_dev,
        "total_wall_s": round(time.perf_counter() - T_START, 1),
        "configs": results,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
