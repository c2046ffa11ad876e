"""Riemannian IK on a UR10 with a table obstacle environment.

Mirror of the reference's experiments/riemannian_example.py, batched: one
call solves a whole batch of goals with obstacles, prints success metrics.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from graphik_tpu import api
from graphik_tpu.parallel.mesh import summarize
from graphik_tpu.robots.library import load_ur10
from graphik_tpu.solvers.riemannian import TRParams
from graphik_tpu.utils.environments import table_environment


def main(batch=64, seed=0):
    tpl, graph = load_ur10()

    # obstacle environment (utils.py:179-191)
    for center, radius in table_environment():
        graph = graph.add_spherical_obstacle(center, radius)
    print(f"UR10 with {graph.n_obstacles} obstacles, N = {graph.N} nodes")

    # random reachable goals
    T_goal, q_goal = api.random_goals(graph, jax.random.PRNGKey(seed), (batch,))

    out = api.solve_ik(graph, jnp.asarray(T_goal), params=TRParams(maxiter=1000))
    stats = summarize(out)
    print("success rate (pos<1mm, rot<1deg, limits ok):", float(stats["success_rate"]))
    print("median pos err:", float(stats["median_pos_err"]))
    print("mean iterations:", float(stats["mean_iterations"]))


if __name__ == "__main__":
    main()
