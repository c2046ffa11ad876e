"""CIDGIK convex-iteration IK on a UR10 (reference experiments/cidgik_example.py).

Note: the reference's version imports a nonexistent `load_9_dof` (stale);
this example is the working equivalent.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from graphik_tpu import api
from graphik_tpu.robots.library import load_ur10
from graphik_tpu.solvers.cidgik import CidgikParams, compile_cidgik, solve_cidgik


def main(batch=16, seed=0):
    tpl, graph = load_ur10()
    comp = compile_cidgik(graph)

    T_goal, q_goal = api.random_goals(graph, jax.random.PRNGKey(seed), (batch,))
    # the tuned serving point: Newton-Schulz cone projection, warm-
    # started (long, short) convex-iteration schedule, rho=10 (see
    # CidgikParams.production and bench.py)
    out = solve_cidgik(comp, jnp.asarray(T_goal),
                       params=CidgikParams.production())

    e_pos, e_rot = api.pose_error(graph, out["q"], jnp.asarray(T_goal))
    hit = (np.asarray(e_pos) < 1e-2) & (np.asarray(e_rot) < 1e-2)
    print("CIDGIK success rate (err < 0.01):", hit.mean())
    print("median pos err:", float(np.median(np.asarray(e_pos))))
    print("median excess-rank eig sum:", float(np.median(np.asarray(out["eig_sum"]))))
    print("feasible:", int(np.sum(np.asarray(out["status"]) == 0)), "/", batch)


def main_obstacles(batch=8, seed=0):
    """UR10 over the table environment (the reference example's scene):
    obstacle inequalities enter as LMI rows of the SDP relaxation
    (sdp_snl.py:356-398 analogue) through the split ADMM engine."""
    from graphik_tpu.graphs.problem import ProblemStructure
    from graphik_tpu.robots import kinematics
    from graphik_tpu.utils.environments import table_environment

    tpl, _ = load_ur10()
    graph = ProblemStructure.from_template(
        tpl, obstacles=table_environment()
    )
    comp = compile_cidgik(graph)

    # feasible goals: FK of configurations that clear the table
    rng = np.random.RandomState(seed)
    goals = []
    while len(goals) < batch:
        q = rng.uniform(-np.pi, np.pi, graph.n)
        _, ok = graph.check_distance_limits(graph.realization(jnp.asarray(q)))
        if bool(ok):
            goals.append(np.asarray(kinematics.pose(tpl, jnp.asarray(q), graph.n)))
    T_goal = jnp.asarray(np.stack(goals))

    out = solve_cidgik(comp, T_goal, params=CidgikParams.production())
    # production pipeline: GN polish drives the ~cm ADMM basin to machine
    # precision while keeping obstacle clearance (api.polish_solution)
    with jax.default_matmul_precision("highest"):
        e_pos0, e_rot0 = api.pose_error(graph, out["q"], T_goal)
        viol, ok = jax.vmap(
            lambda qi: graph.check_distance_limits(graph.realization(qi))
        )(out["q"])
        q, e_pos, e_rot, viol, ok = api.polish_solution(
            graph, out["q"], T_goal, e_pos0, e_rot0, viol, ok
        )
    hit = (np.asarray(e_pos) < 1e-3) & (np.asarray(e_rot) < np.pi / 180)
    print("obstacle scene polished success (@1mm):", hit.mean())
    print("obstacle clearance:", np.asarray(ok).mean())


def main_floor(batch=8, seed=3):
    """floor_mode (reference convex_iteration.py:185-192): the base is
    freed from its anchors and constrained only to the floor plane, so the
    solver may place the robot anywhere on the floor that reaches the
    goal. The returned q is expressed in the solved base frame and
    out["T_base"] maps it back: world ee pose = T_base @ fk(q)."""
    tpl, graph = load_ur10()
    comp = compile_cidgik(graph, floor_mode=True)

    T_goal, _ = api.random_goals(graph, jax.random.PRNGKey(seed), (batch,))
    out = solve_cidgik(comp, jnp.asarray(T_goal),
                       params=CidgikParams.production())

    Tb = np.asarray(out["T_base"], np.float64)
    # goal expressed in each solution's own base frame (per-ee axis kept)
    Tg_base = np.linalg.inv(Tb)[:, None] @ np.asarray(T_goal, np.float64)
    e_pos, e_rot = api.pose_error(graph, out["q"], jnp.asarray(Tg_base))
    hit = (np.asarray(e_pos) < 1e-2) & (np.asarray(e_rot) < 5e-2)
    print("floor_mode success rate (err < 1cm):", hit.mean())
    print("base positions on the floor (x, y, z):")
    print(np.round(Tb[:, :3, 3], 3))


if __name__ == "__main__":
    main()
    main_obstacles()
    main_floor()
