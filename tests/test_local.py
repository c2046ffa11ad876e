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

    def test_obstacle_constraints_enforced(self, ur10):
        """Augmented-Lagrangian obstacles: ZERO violation at convergence
        (not merely an active penalty) - the reference's SLSQP-constraint
        semantics (joint_angle_solver.py:83-126)."""
        # obstacle sitting on the zero-config elbow: solutions must move away
        pos0 = np.asarray(ur10.realization(jnp.zeros(6)))
        ps_obs = ur10.add_spherical_obstacle(pos0[3], 0.2)
        key = jax.random.PRNGKey(3)
        q_goal = kinematics.random_configuration(ur10.template, key, (4,))
        T_goal = kinematics.pose(ur10.template, q_goal, 6)
        out = local.solve_local(
            ps_obs, T_goal, q_goal + 0.1, params=LocalParams(maxiter=60)
        )
        q = np.asarray(out["q"])
        assert np.all(np.isfinite(q))
        # constraint satisfied to sub-mm on every instance
        assert np.all(np.asarray(out["max_violation"]) < 1e-3), (
            out["max_violation"]
        )
        pos = np.asarray(ps_obs.realization(out["q"]))
        d = np.linalg.norm(pos[:, 1:7, :] - pos0[3], axis=-1)
        assert (d >= 0.2 - 1e-3).all()


class TestJacobians:
    def test_jacobian_geometric_matches_fd(self, ur10):
        tpl = ur10.template
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.uniform(-np.pi, np.pi, 6))
        J = np.asarray(kinematics.jacobian_geometric(tpl, q, 6))
        eps = 1e-7
        for i in range(6):
            dq = np.zeros(6)
            dq[i] = eps
            Tp = np.asarray(kinematics.pose(tpl, q + dq, 6))
            Tm = np.asarray(kinematics.pose(tpl, q - dq, 6))
            # linear part: ee position derivative
            v_fd = (Tp[:3, 3] - Tm[:3, 3]) / (2 * eps)
            np.testing.assert_allclose(J[:3, i], v_fd, atol=1e-6)
            # angular part: dR R^T vee
            dR = (Tp[:3, :3] - Tm[:3, :3]) / (2 * eps)
            W = dR @ np.asarray(kinematics.pose(tpl, q, 6))[:3, :3].T
            w_fd = np.array([W[2, 1], W[0, 2], W[1, 0]])
            np.testing.assert_allclose(J[3:, i], w_fd, atol=1e-6)

    def test_linear_jacobians_match_fd(self, ur10):
        tpl = ur10.template
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.uniform(-np.pi, np.pi, 6))
        J_all = np.asarray(kinematics.linear_jacobians(tpl, q))
        eps = 1e-7
        for i in range(6):
            dq = np.zeros(6)
            dq[i] = eps
            Tp = np.asarray(kinematics.all_poses(tpl, q + dq))
            Tm = np.asarray(kinematics.all_poses(tpl, q - dq))
            v_fd = (Tp[:, :3, 3] - Tm[:, :3, 3]) / (2 * eps)
            np.testing.assert_allclose(J_all[:, :, i], v_fd, atol=1e-6)

    def test_linear_jacobians_planar(self):
        from graphik_tpu.robots.templates import planar_from_links

        tpl = planar_from_links(np.ones(4))
        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.uniform(-np.pi, np.pi, 4))
        J_all = np.asarray(kinematics.linear_jacobians(tpl, q))
        eps = 1e-7
        for i in range(4):
            dq = np.zeros(4)
            dq[i] = eps
            Tp = np.asarray(kinematics.all_poses(tpl, q + dq))
            Tm = np.asarray(kinematics.all_poses(tpl, q - dq))
            v_fd = (Tp[:, :2, 2] - Tm[:, :2, 2]) / (2 * eps)
            np.testing.assert_allclose(J_all[:, :, i], v_fd, atol=1e-6)
