"""Benchmark: batched IK throughput over the BASELINE config matrix.

Prints the headline JSON line
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "configs": {...}}
INCREMENTALLY: a full valid line is flushed after every finished config (the
headline fields are identical on every line, so whichever line a harness
parses - first or last - carries the same verdict). A wall-clock budget
(BENCH_BUDGET_S, default 480 s) stops *starting* new configs near the
deadline, and SIGTERM/SIGINT flush whatever has been measured, so a
supervisor timeout still lands a number instead of rc=124 with no output.

Headline metric: successful UR10 IK solves/sec/chip - throughput times the
success rate at the BASELINE criterion (pos err < 1 mm, rot err < 1 deg,
joint/obstacle limits feasible). Baseline denominator: the BASELINE.json
target of 10k solves/sec on a v5e-8, i.e. 1250 solves/sec/chip.

The "configs" field carries one entry per BASELINE.md parity config
(planar 6/10-DoF, UR10, KUKA IIWA, LWA4D, UR10+table obstacles, restart
pools, CIDGIK), each with throughput and success rate; every 3D parity
family also reports p50 latency of a 128-instance serving quantum. The
headline (ur10) runs FIRST so the most important number exists within
~1 minute, and is re-measured LAST (`ur10_recheck`, warmest state, extra
reps) - the headline value takes the better of the two measurements of
that same config, which removes the cold-start noise that made round-4
driver numbers land up to 35% below warm runs of identical code.

Goal generation is jitted per config: eager per-op dispatch through the TPU
tunnel costs ~60 s per call, which is what starved the round-2 run.

Env overrides: BENCH_BATCH, BENCH_MAXITER, BENCH_MAXINNER, BENCH_REPS,
BENCH_HEAD_REPS (reps for the headline config, default 4), BENCH_CONFIGS
(comma-separated subset), BENCH_BUDGET_S, BENCH_LATENCY (comma-separated
configs measuring the b128 latency quantum; default all 3D families).
"""

import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_PER_CHIP = 1250.0  # 10k/s on v5e-8 (BASELINE.md)

T_START = time.perf_counter()


def log(msg):
    print(f"[bench] {msg} t={time.perf_counter() - T_START:.1f}s",
          file=sys.stderr, flush=True)


class Emitter:
    """Accumulates per-config results; every flush prints a complete line."""

    def __init__(self, static_fields):
        self.static = static_fields
        self.results = {}

    def line(self, compact=False):
        # The headline config (ur10) is measured TWICE in a full run: first
        # (so a number exists within a minute) and again at the very end
        # (ur10_recheck). Round 4 showed the first measurement eats a
        # cold-host/tunnel penalty worth up to 35% on some driver runs while
        # later configs in the same run hit full speed; both measurements
        # are the SAME code and config, so the headline takes the better.
        head = self.results.get("ur10", {})
        recheck = self.results.get("ur10_recheck", {})
        if (recheck.get("effective_solves_per_sec") or 0.0) > (
            head.get("effective_solves_per_sec") or 0.0
        ):
            head = recheck
        effective = head.get("effective_solves_per_sec") or 0.0
        n_dev = self.static["n_devices"]
        out = {
            "metric": "ur10_successful_solves_per_sec_per_chip",
            "value": round(effective / n_dev, 2),
            "unit": "solves/s/chip",
            "vs_baseline": round(effective / n_dev / BASELINE_PER_CHIP, 4),
            "throughput_solves_per_sec": head.get("throughput_solves_per_sec"),
            "success_rate": head.get("success_rate"),
        }
        if compact:
            return out
        out.update(self.static)
        out["total_wall_s"] = round(time.perf_counter() - T_START, 1)
        out["configs"] = self.results
        return out

    def flush(self):
        print(json.dumps(self.line()), flush=True)

    def flush_compact(self):
        # The very last stdout line is a SHORT headline-only record: the
        # round-3 driver's tail window truncated the ~2.5 KB full-matrix
        # line mid-JSON (parsed: null), so the final line must stay small.
        print(json.dumps(self.line(compact=True)), flush=True)

    def emergency_flush(self, fd=1):
        # Signal-safe: a single os.write of both lines (the full matrix,
        # then the compact headline LAST) to the stdout fd - print() from a
        # handler can interleave mid-line with a flush already in progress
        # on the main thread.
        payload = (
            "\n" + json.dumps(self.line()) + "\n"
            + json.dumps(self.line(compact=True)) + "\n"
        )
        os.write(fd, payload.encode())


def main():
    import jax
    import jax.numpy as jnp

    from graphik_tpu.utils.cache import ensure_cache_dir

    # zstandard's compress/decompress paths segfault after enough
    # accumulated compilations in one process on this jaxlib/host combo
    # (see tests/conftest.py); unbind it so the cache uses zlib.
    try:
        from jax._src import compilation_cache as _cc

        _cc.zstandard = None
    except Exception:
        pass

    # host-ISA-stamped cache: a VM migration leaves stale AOT CPU code
    # that SEGFAULTS when loaded (utils/cache.py) - wipe on mismatch.
    jax.config.update("jax_compilation_cache_dir", ensure_cache_dir())
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from graphik_tpu import api
    from graphik_tpu.parallel.mesh import make_restart_solver, summarize
    from graphik_tpu.robots import library
    from graphik_tpu.solvers.local import LocalParams
    from graphik_tpu.solvers.riemannian import TRParams
    from graphik_tpu.utils.environments import table_environment

    # Batch 4096 amortizes the fixed prepare/finish stage cost that dominates
    # at 1024 (8192 is already past the knee). Round-4 operating point:
    # the subspace-iteration MDS init cut the fixed stage cost ~5x, moving
    # the effective-throughput optimum from maxiter 150 to 100 (ur10
    # success 0.874, ratio 0.985 vs the n=1000 f64 denominator 0.887, at
    # ~21.4k successful solves/s/chip; 120 buys +0.3% success for -5%
    # effective throughput, 150 +0.6% for -13%).
    # 8192 (round 5): +8% ur10 throughput over 4096 at identical success
    # (25.3k vs 23.3k raw) - the fused TR kernel is still dispatch/lane-
    # underfilled at 4096. 16384 adds <1% more at 2x compile and has hit
    # transient remote-compile tunnel failures; not worth it.
    batch = int(os.environ.get("BENCH_BATCH", "8192"))
    maxiter = int(os.environ.get("BENCH_MAXITER", "100"))
    # tCG budget 24: success within 0.3% of 48 at +45% throughput.
    maxinner = int(os.environ.get("BENCH_MAXINNER", "24"))
    # GN polish budget 10: quadratic convergence needs ~4 accepted steps
    # from the f32 basin; 30 buys +0.5% success for +28% wall.
    polish_iters = int(os.environ.get("BENCH_POLISH", "10"))
    reps = int(os.environ.get("BENCH_REPS", "2"))
    # The metric of record gets more insulation than the parity rows:
    # extra reps + min() (round-4 driver runs showed 35% cold-start noise
    # on the first-measured config with reps=2).
    head_reps = int(os.environ.get("BENCH_HEAD_REPS", "4"))
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "480"))
    # p50 latency reported for every BASELINE parity family (VERDICT r4 #9).
    lat_configs = set(
        os.environ.get(
            "BENCH_LATENCY", "ur10,kuka_iiwa,lwa4d,ur10_table"
        ).split(",")
    )
    lat_batch = 128

    # production() preset: opts into the plateau stop (plateau_every=16)
    # explicitly - bare TRParams() is reference-faithful (no plateau).
    #
    # res_tol (feasibility-aware early stop) is deliberately NOT set:
    # RES_TOL_SWEEP.json's apparent ~5% wall saving at res_tol=2e-3 does
    # not survive a controlled A/B (alternating-order, shared warm state:
    # walls 0.180/0.178/0.181 s for res_tol 0/1e-3/2e-3 - identical within
    # noise, while success falls 0.874 -> 0.848). In the fused Pallas
    # kernel wall time is the slowest lane per 2048-lane tile and the
    # iteration tail always reaches maxiter, so per-lane early exits free
    # no wall; effective throughput strictly falls. Rejected (VERDICT r4
    # item 4); the sweep order's cold first row is what made res_tol look
    # like a win.
    params = TRParams.production(maxiter=maxiter, maxinner=maxinner)
    polish_params = LocalParams(maxiter=polish_iters, tol_grad=1e-8)
    n_dev = jax.device_count()

    emitter = Emitter({
        "batch": batch,
        "maxiter": maxiter,
        "maxinner": maxinner,
        "device": str(jax.devices()[0]),
        "n_devices": n_dev,
    })

    def on_term(signum, frame):
        log(f"signal {signum}: flushing partial results")
        emitter.emergency_flush()
        os._exit(128 + signum)  # honest abnormal-termination code

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    def sync(tree):
        # block_until_ready is synchronous on this platform (verified
        # round 4 against transfer-synced timings of a known-duration
        # program). The timed region still includes delivery of the
        # USER-FACING results to the host - q and the success metrics -
        # but not internal solver state: the tunnel moves ~6-40 MB/s, so
        # the previous first-leaf transfer (the (B, N, d) Y matrix, ~1 MB)
        # charged ~75 ms of pure tunnel artifact to every measurement.
        jax.block_until_ready(tree)
        # ONE small representative transfer (each tunnel round trip has a
        # large fixed cost, so several sequential np.asarray calls are
        # slower than a single 1 MB pull - measured round 4).
        if isinstance(tree, dict) and "e_pos" in tree:
            np.asarray(tree["e_pos"])
        else:
            small = min(
                jax.tree_util.tree_leaves(tree), key=lambda a: a.size
            )
            np.asarray(small)

    def warmup_and_timing_check():
        """Absorb device/tunnel cold start; verify the sync discipline.

        (a) Runs a throwaway device program so the first MEASURED config
        does not pay tunnel/driver first-touch costs (round-4 driver runs
        showed the first config up to 35% slow vs identical later configs).
        (b) Self-check (ADVICE r4): the bench times with block_until_ready
        + one small pull on the claim that block_until_ready is synchronous
        on this platform. If that property ever regresses, every wall
        undercounts and the headline silently inflates - so compare a
        block-synced timing of a known-duration program against a
        transfer-synced timing and warn loudly on divergence.
        """
        @jax.jit
        def burn(x):
            def body(_, a):
                return a @ a * (1.0 / 1024.0) + x[0, 0]
            return jax.lax.fori_loop(0, 6000, body, x)[0, 0]

        x = jnp.ones((1024, 1024), jnp.float32)
        float(np.asarray(burn(x)))  # compile + first-touch drain
        # Calibrate the program's true duration with an unambiguous sync
        # (materializing the value cannot return before the compute).
        full = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(np.asarray(burn(x)))
            full.append(time.perf_counter() - t0)
        full_s = min(full)
        # Now time it exactly the way sync() times solver reps: dispatch,
        # jax.block_until_ready, one small pull.
        t0 = time.perf_counter()
        r = burn(x)
        jax.block_until_ready(r)
        np.asarray(r)
        sync_s = time.perf_counter() - t0
        if sync_s < 0.6 * full_s:
            log(
                "WARNING: sync-style timing "
                f"({sync_s * 1e3:.1f} ms) << true program duration "
                f"({full_s * 1e3:.1f} ms): block_until_ready may no "
                "longer be synchronous on this platform; walls (and the "
                "headline) may be UNDERCOUNTED."
            )
        emitter.static["sync_check_ms"] = [
            round(sync_s * 1e3, 1), round(full_s * 1e3, 1)
        ]
        log(f"warmup done: sync-style {sync_s * 1e3:.1f} ms vs "
            f"calibrated duration {full_s * 1e3:.1f} ms")

    def build(name):
        base = name.split("_restarts")[0]
        base = base.replace("_cidgik_sparse", "").replace("_cidgik", "")
        base = base.replace("_recheck", "")
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

    def goal_fn(ps, B):
        # Jitted goal generation: eager FK dispatch through the device
        # tunnel costs ~60 s per call and was the round-2 budget killer.
        @jax.jit
        def gen(key):
            return api.random_goals(ps, key, (B,))[0]

        return gen

    def run_riemannian(name, ps, B, restarts=0):
        gen = goal_fn(ps, B)
        T_goal = gen(jax.random.PRNGKey(0))
        sync(T_goal)

        cfg_params = params
        if name == "ur10_table":
            # Obstacle scenes need a deeper single-shot budget than the
            # plain configs; with the round-4 subspace init, (250, 32)
            # holds ratio 1.038 vs the f64 denominator 0.765 at ~4.8k
            # solves/s (the round-3 (400, 32) point is 29% slower at
            # ratio 1.045 - no longer the efficient frontier).
            cfg_params = TRParams.production(maxiter=250, maxinner=32)
        # smooth_iters=2: partial bound-smoothing closure (paths of <= 4
        # edges) measures identical success at -6% wall on the near-
        # complete 16-node bounds graph (round-4 sweep).
        if restarts:
            rsolver = make_restart_solver(
                ps, n_restarts=restarts, params=cfg_params,
                polish_params=polish_params, smooth_iters=2,
            )
            solver = lambda Tg, k=jax.random.PRNGKey(7): rsolver(Tg, k)
        else:
            solver = api.make_solver(
                ps, params=cfg_params, polish_params=polish_params,
                smooth_iters=2,
            )

        t0 = time.perf_counter()
        out = solver(T_goal)
        sync(out)
        compile_s = time.perf_counter() - t0

        times = []
        n_reps = head_reps if name in ("ur10", "ur10_recheck") else reps
        for r in range(n_reps):
            Tg = gen(jax.random.PRNGKey(r + 1))
            sync(Tg)
            t0 = time.perf_counter()
            out = solver(Tg)
            sync(out)
            times.append(time.perf_counter() - t0)
        wall = min(times)
        stats = {k: float(v) for k, v in summarize(out).items()}

        res = {
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
        }
        if name in lat_configs:
            # p50 latency: wall time of a small serving quantum (its own
            # batch shape = its own compile, so only where asked).
            gen_s = goal_fn(ps, lat_batch)
            Tg_s = gen_s(jax.random.PRNGKey(99))
            sync(Tg_s)
            lat = []
            for _ in range(3):
                t0 = time.perf_counter()
                sync(solver(Tg_s))
                lat.append(time.perf_counter() - t0)
            res["p50_latency_ms_b128"] = round(float(np.median(lat)) * 1e3, 1)
        return res

    def run_cidgik(ps, B, sparse=False, cparams=None):
        from graphik_tpu.solvers import cidgik as cd
        from graphik_tpu.solvers.cidgik import CidgikParams

        # CidgikParams.production(): Newton-Schulz cone projection +
        # warm-started (1000, 9x500) schedule (round 4) + rho=10 (round-5
        # sweep: raw ADMM @1cm 0.57 -> 0.80 dense / 0.53 -> 0.77 table at
        # identical cost - the VERDICT r4 #2 accuracy gap, closed).
        # The plain dense config shortens the schedule to (700, 9x300):
        # polished @1mm is IDENTICAL (0.8896) at ~1.6x throughput; the
        # sparse/table configs keep the full schedule (their headline is
        # accuracy, and the short schedule costs them 0.3-0.4% @1mm).
        if cparams is None:
            cparams = CidgikParams.production(
                admm_iters=700, admm_iters_rest=300
            )
        if sparse:
            from graphik_tpu.solvers import cidgik_sparse as cds

            comp = cds.compile_cidgik_sparse(ps)
            solve = lambda Tg: cds.solve_cidgik_sparse(
                comp, Tg, params=cparams
            )
        else:
            comp = cd.compile_cidgik(ps)
            solve = lambda Tg: cd.solve_cidgik(comp, Tg, params=cparams)
        gen = goal_fn(ps, B)
        T_goal = gen(jax.random.PRNGKey(0))
        sync(T_goal)

        # f32 ADMM lands in the right basin at ~cm accuracy; the GN polish
        # provides the final precision the reference gets from MOSEK's 1e-6
        # interior point (sdp_formulations.py:9-43). Stage-jitted: the
        # monolithic ADMM+polish program is over XLA's compile-time cliff.
        @jax.jit
        def stage_admm(Tg):
            out = solve(Tg)
            return out["q"], out["eig_sum"], out["feas"]

        @jax.jit
        def stage_finish(q0, Tg):
            # highest precision: bf16 FK noise in the validation path
            # misclassifies feasible solutions (see api.polish_solution)
            with jax.default_matmul_precision("highest"):
                e_pos0, e_rot0 = api.pose_error(ps, q0, Tg)
                viol, ok = ps.check_distance_limits(ps.realization(q0))
                q, e_pos, e_rot, viol, ok = api.polish_solution(
                    ps, q0, Tg, e_pos0, e_rot0, viol, ok
                )
                return e_pos0, e_rot0, e_pos, e_rot, ok

        def solver(Tg):
            q0, eig, feas = stage_admm(Tg)
            return stage_finish(q0, Tg) + (eig, feas)
        t0 = time.perf_counter()
        out = solver(T_goal)
        sync(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = solver(T_goal)
        sync(out)
        wall = time.perf_counter() - t0
        e_pos0, e_rot0, e_pos, e_rot, ok, eig, feas = (
            np.asarray(x) for x in out
        )
        raw = (e_pos0 < 1e-2) & (e_rot0 < 1e-2)
        hit = (e_pos < 1e-2) & (e_rot < 1e-2)
        mm = (e_pos < 1e-3) & (e_rot < np.deg2rad(1.0))
        return {
            "throughput_solves_per_sec": round(B / wall, 2),
            "success_rate_1cm": round(float(hit.mean()), 4),
            # pose-only @1mm (round-3-comparable) + the stricter variant
            # that also demands limit/obstacle feasibility of the polished q
            "success_rate_1mm": round(float(mm.mean()), 4),
            "success_rate_1mm_feasible": round(float((mm & ok).mean()), 4),
            "raw_admm_rate_1cm": round(float(raw.mean()), 4),
            "median_eig_sum": float(np.median(np.abs(eig))),
            "median_feas": float(np.median(feas)),
            "wall_s": round(wall, 4),
            "batch": B,
            "compile_s": round(compile_s, 1),
        }

    # Headline first; the CIDGIK family third/fourth (the only configs
    # covering that solver family, so they must land before the budget
    # gate can fire on a slow-compile day). ur10_table_cidgik exercises
    # the full 100-sphere obstacle LMI set through the split ADMM engine;
    # ur10_cidgik_sparse is the clique-decomposed path.
    all_configs = [
        "ur10", "ur10_table", "ur10_cidgik", "ur10_table_cidgik",
        "ur10_cidgik_sparse", "kuka_iiwa", "lwa4d", "planar6", "planar10",
        "ur10_restarts4", "ur10_table_restarts2", "planar6_restarts2",
        "planar10_restarts2",
    ]
    sel = os.environ.get("BENCH_CONFIGS")
    configs = sel.split(",") if sel else all_configs
    # Re-measure the headline config at the END of the run: same code,
    # same config, warmest state. Emitter.line takes the better of the
    # two ur10 measurements (VERDICT r4 #1 - the first-slot measurement
    # ran up to 35% cold on driver runs).
    if "ur10" in configs and "ur10_recheck" not in configs:
        configs = configs + ["ur10_recheck"]

    warmup_and_timing_check()

    # Conservative first-run cost guesses (seconds, cold compile included);
    # replaced by measured costs of the same kind as the run progresses.
    est = {"riemannian": 75.0, "restarts": 90.0, "cidgik": 120.0,
           "recheck": 15.0}

    measured = set()
    for name in configs:
        kind = ("recheck" if name == "ur10_recheck"
                else "cidgik" if "_cidgik" in name
                else "restarts" if "_restarts" in name else "riemannian")
        # No restarts config has run yet, but the riemannian kind has: a
        # restart config is the same solver at a different batch shape, so
        # its cost tracks the measured riemannian cost (x1.3 for the extra
        # restart axis), not the conservative cold-start constant. Without
        # this, a COLD run that measures expensive riemannian configs
        # leaves the stale 90 s guess in place and skips every restart
        # config even when the warm cost is ~15 s (observed round 5).
        if kind == "restarts" and kind not in measured \
                and "riemannian" in measured:
            est[kind] = max(20.0, 1.3 * est["riemannian"])
        elapsed = time.perf_counter() - T_START
        # The end-of-run headline re-measurement gets a small grace window
        # past the budget: it is cheap warm (compile cached in-process) and
        # landing the warm headline is the reason the budget exists at all.
        gate_s = budget_s + 45.0 if kind == "recheck" else budget_s
        if elapsed + est[kind] > gate_s:
            emitter.results[name] = {"skipped_budget": True}
            log(f"config {name}: SKIPPED (elapsed {elapsed:.0f}s + "
                f"~{est[kind]:.0f}s > budget {budget_s:.0f}s)")
            continue
        t_cfg = time.perf_counter()
        ps = build(name)
        log(f"config {name}: start")
        try:
            if name.endswith("_cidgik_sparse"):
                # 1024 (up from round-4's 256): the split sparse engine's
                # fused iteration costs near-constant wall up to ~1k lanes,
                # and the bigger goal sample reads +1% @1mm.
                emitter.results[name] = run_cidgik(
                    ps, min(batch, 1024), sparse=True
                )
            elif name.endswith("_cidgik"):
                from graphik_tpu.solvers.cidgik import CidgikParams

                if "table" in name:
                    # obstacle scene: ~550 constraint rows through the
                    # split engine; the round-5 production point (full
                    # (1000, 9x500) schedule + rho=10) holds ~300+
                    # solves/s at B=512, so the round-4 shortened
                    # schedule is no longer needed.
                    emitter.results[name] = run_cidgik(
                        ps, min(batch, 512),
                        cparams=CidgikParams.production(),
                    )
                else:
                    emitter.results[name] = run_cidgik(ps, min(batch, 1024))
            elif "_restarts" in name:
                r = int(name.split("_restarts")[1])
                emitter.results[name] = run_riemannian(
                    name, ps, batch // r, restarts=r
                )
            else:
                emitter.results[name] = run_riemannian(name, ps, batch)
            log(f"config {name}: done {emitter.results[name]}")
        except Exception as exc:  # keep the bench line even if one config dies
            emitter.results[name] = {"error": f"{type(exc).__name__}: {exc}"}
            log(f"config {name}: FAILED {exc}")
        est[kind] = max(est[kind] * 0.5, time.perf_counter() - t_cfg)
        measured.add(kind)
        emitter.flush()

    # Final line: compact headline only, so any driver tail window parses it.
    emitter.flush_compact()


if __name__ == "__main__":
    main()
