"""Local joint-space solver tests (reference joint_angle_solver.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphik_tpu import api
from graphik_tpu.graphs.problem import ProblemStructure
from graphik_tpu.robots import kinematics
from graphik_tpu.solvers import local
from graphik_tpu.solvers.local import LocalParams
from tests.test_kinematics import ur10_template


@pytest.fixture(scope="module")
def ur10():
    return ProblemStructure.from_template(ur10_template())


class TestLocalSolver:
    def test_converges_from_near_goal(self, ur10):
        key = jax.random.PRNGKey(0)
        q_goal = kinematics.random_configuration(ur10.template, key, (4,))
        T_goal = kinematics.pose(ur10.template, q_goal, 6)
        q0 = q_goal + 0.3 * jax.random.normal(jax.random.PRNGKey(1), q_goal.shape)
        out = local.solve_local(ur10, T_goal, q0)
        e_pos, e_rot = api.pose_error(ur10, out["q"], T_goal)
        assert np.all(np.asarray(e_pos) < 1e-4), (e_pos, out["cost"])
        assert np.all(np.asarray(e_rot) < 1e-4)

    def test_respects_joint_limits(self, ur10):
        tpl = ur10.template
        lb = -0.5 * np.pi * np.ones(6)
        ub = 0.5 * np.pi * np.ones(6)
        tpl2 = tpl.with_limits(lb, ub)
        ps2 = ProblemStructure.from_template(tpl2)
        key = jax.random.PRNGKey(2)
        q_goal = kinematics.random_configuration(tpl2, key, (2,))
        T_goal = kinematics.pose(tpl2, q_goal, 6)
        out = local.solve_local(ps2, T_goal, jnp.zeros((2, 6)))
        q = np.asarray(out["q"])
        assert np.all(q >= lb - 1e-9) and np.all(q <= ub + 1e-9)

    def test_obstacle_penalty_active(self, ur10):
        # obstacle sitting on the zero-config elbow: solutions move away
        pos0 = np.asarray(ur10.realization(jnp.zeros(6)))
        ps_obs = ur10.add_spherical_obstacle(pos0[3], 0.2)
        key = jax.random.PRNGKey(3)
        q_goal = kinematics.random_configuration(ur10.template, key)
        T_goal = kinematics.pose(ur10.template, q_goal, 6)
        out = local.solve_local(
            ps_obs, T_goal, q_goal + 0.1, params=LocalParams(maxiter=60)
        )
        # the pose part may trade off against the obstacle; check no NaN
        assert np.all(np.isfinite(np.asarray(out["q"])))
