"""Diagnose the TPU f32 CIDGIK accuracy loss stage by stage.

For a batch of UR10 goals, report:
  * raw ADMM point residual (free-point distance to FK-true points)
  * pose error after joint recovery (no polish)
  * pose error after GN polish
across admm_iters / eigh_sweeps / refine settings.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

B = int(os.environ.get("DIAG_B", "128"))


def main():
    import jax
    import jax.numpy as jnp

    from graphik_tpu.utils.cache import ensure_cache_dir
    jax.config.update("jax_compilation_cache_dir", ensure_cache_dir())
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from graphik_tpu import api
    from graphik_tpu.robots import library
    from graphik_tpu.solvers import cidgik as cd
    from graphik_tpu.solvers.cidgik import CidgikParams

    ps = library.load_ur10()[1]
    comp = cd.compile_cidgik(ps)
    key = jax.random.PRNGKey(0)
    T_goal, q_true = api.random_goals(ps, key, (B,))
    T_goal = jnp.asarray(T_goal)
    P_true = ps.realization(jnp.asarray(q_true))  # FK-true node positions

    def run(tag, cparams):
        def pipeline(Tg):
            out = cd.solve_cidgik(comp, Tg, params=cparams)
            e_pos0, e_rot0 = api.pose_error(ps, out["q"], Tg)
            viol, ok = ps.check_distance_limits(ps.realization(out["q"]))
            q, e_pos, e_rot, viol, ok = api.polish_solution(
                ps, out["q"], Tg, e_pos0, e_rot0, viol, ok
            )
            return out["points"], out["feas"], out["eig_sum"], e_pos0, e_rot0, e_pos, e_rot

        solver = jax.jit(pipeline)
        t0 = time.perf_counter()
        res = jax.block_until_ready(solver(T_goal))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = jax.block_until_ready(solver(T_goal))
        wall = time.perf_counter() - t0
        pts, feas, eig, e_pos0, e_rot0, e_pos, e_rot = (np.asarray(x) for x in res)
        # free-point error vs FK truth (gauge is fixed by anchors, comparable)
        perr = np.linalg.norm(pts - np.asarray(P_true), axis=-1).max(-1)
        line = {
            "tag": tag,
            "wall_s": round(wall, 2),
            "compile_s": round(compile_s, 1),
            "median_point_err": round(float(np.median(perr)), 5),
            "median_feas": float(np.median(feas)),
            "median_eig_sum": float(np.median(eig)),
            "raw_1cm": round(float(((e_pos0 < 1e-2) & (e_rot0 < 1e-2)).mean()), 4),
            "raw_median_pos": round(float(np.median(e_pos0)), 5),
            "polished_1cm": round(float(((e_pos < 1e-2) & (e_rot < 1e-2)).mean()), 4),
            "polished_1mm": round(float(((e_pos < 1e-3) & (e_rot < np.deg2rad(1))).mean()), 4),
            "polished_median_pos": round(float(np.median(e_pos)), 6),
        }
        print(json.dumps(line), flush=True)

    run("bench(800/8,js8,r1)", CidgikParams(admm_iters=800, max_outer=8))
    run("more_admm(2000/10)", CidgikParams(admm_iters=2000, max_outer=10))
    run("js12(800/8)", CidgikParams(admm_iters=800, max_outer=8, eigh_sweeps=12))
    run("refine2(800/8)", CidgikParams(admm_iters=800, max_outer=8, refine_steps=2))


if __name__ == "__main__":
    main()
