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
    out = solve_cidgik(comp, jnp.asarray(T_goal), params=CidgikParams())

    e_pos, e_rot = api.pose_error(graph, out["q"], jnp.asarray(T_goal))
    hit = (np.asarray(e_pos) < 1e-2) & (np.asarray(e_rot) < 1e-2)
    print("CIDGIK success rate (err < 0.01):", hit.mean())
    print("median pos err:", float(np.median(np.asarray(e_pos))))
    print("median excess-rank eig sum:", float(np.median(np.asarray(out["eig_sum"]))))
    print("feasible:", int(np.sum(np.asarray(out["status"]) == 0)), "/", batch)


if __name__ == "__main__":
    main()
