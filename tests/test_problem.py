"""Problem-graph compiler tests, following the reference test strategy:
FK round-trip oracles (tests/test_joint_variables.py), bound validity
(tests/test_bound_smoothing.py), and distance-matrix consistency
(tests/test_distance_matrix.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphik_tpu.graphs.problem import ProblemStructure
from graphik_tpu.robots import kinematics
from graphik_tpu.robots.templates import planar_from_links, revolute_from_dh
from tests.test_kinematics import UR10_A, UR10_AL, UR10_D, UR10_TH, ur10_template


@pytest.fixture(scope="module")
def ur10():
    return ProblemStructure.from_template(ur10_template())


@pytest.fixture(scope="module")
def planar10():
    return ProblemStructure.from_template(planar_from_links(np.ones(10)))


def true_distance_matrix(ps, q):
    pos = np.asarray(ps.realization(jnp.asarray(q)))
    return np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)


class TestStructure:
    def test_shapes_revolute(self, ur10):
        assert ur10.N == 16
        assert ur10.names[0] == "p0" and ur10.names[-1] == "y"
        assert ur10.omega_struct.shape == (16, 16)
        np.testing.assert_array_equal(ur10.omega_struct, ur10.omega_struct.T)
        np.testing.assert_allclose(ur10.D_struct, ur10.D_struct.T)

    def test_exact_distances_hold_at_random_q(self, ur10):
        """Edges with exact DIST must match FK distances at ANY q
        (they encode rigid structure)."""
        rng = np.random.RandomState(0)
        for _ in range(3):
            q = rng.uniform(-np.pi, np.pi, 6)
            D = true_distance_matrix(ur10, q)
            mask = ur10.omega_struct & ~np.logical_and.outer(
                ur10.anchor_mask, ur10.anchor_mask
            )
            np.testing.assert_allclose(
                (D**2)[mask], ur10.D_struct[mask], atol=1e-6
            )

    def test_bounded_edges_hold_at_random_q(self, ur10):
        """check_L <= D <= check_U on bounded edges at in-limit configs."""
        rng = np.random.RandomState(1)
        for _ in range(5):
            q = rng.uniform(ur10.template.lb[1:], ur10.template.ub[1:])
            D = true_distance_matrix(ur10, q)
            b = ur10.bounded_mask
            assert np.all(D[b] >= ur10.check_L[b] - 1e-6)
            assert np.all(D[b] <= ur10.check_U[b] + 1e-6)

    def test_check_distance_limits(self, ur10):
        rng = np.random.RandomState(2)
        q = rng.uniform(-np.pi, np.pi, 6)
        pos = ur10.realization(jnp.asarray(q))
        viol, ok = ur10.check_distance_limits(pos)
        assert bool(ok)

    def test_planar_structure(self, planar10):
        assert planar10.N == 13
        rng = np.random.RandomState(3)
        q = rng.uniform(-np.pi, np.pi, 10)
        D = true_distance_matrix(planar10, q)
        mask = planar10.omega_struct & ~np.logical_and.outer(
            planar10.anchor_mask, planar10.anchor_mask
        )
        np.testing.assert_allclose((D**2)[mask], planar10.D_struct[mask], atol=1e-6)
        b = planar10.bounded_mask
        assert np.all(D[b] >= planar10.check_L[b] - 1e-6)
        assert np.all(D[b] <= planar10.check_U[b] + 1e-6)


class TestInstance:
    def test_goal_distance_consistency(self, ur10):
        """D_goal on omega edges equals FK distances at the goal config."""
        rng = np.random.RandomState(4)
        q_goal = rng.uniform(-np.pi, np.pi, 6)
        T_goal = kinematics.pose(ur10.template, jnp.asarray(q_goal), 6)
        inst = ur10.instance(T_goal, smooth=False)
        omega, _, _ = ur10.masks()
        D_true = true_distance_matrix(ur10, q_goal) ** 2
        np.testing.assert_allclose(
            np.asarray(inst["D_goal"])[omega], D_true[omega], atol=1e-6
        )

    def test_bound_smoothing_validity(self, ur10):
        """lb <= D_true <= ub elementwise (tests/test_bound_smoothing.py)."""
        rng = np.random.RandomState(5)
        for seed in range(3):
            q_goal = rng.uniform(-np.pi, np.pi, 6)
            T_goal = kinematics.pose(ur10.template, jnp.asarray(q_goal), 6)
            inst = ur10.instance(T_goal)
            D_true = true_distance_matrix(ur10, q_goal)
            lb, ub = np.asarray(inst["lb"]), np.asarray(inst["ub"])
            assert np.all(lb <= D_true + 1e-6)
            assert np.all(D_true <= ub + 1e-6)

    def test_bound_smoothing_validity_planar(self, planar10):
        rng = np.random.RandomState(6)
        for seed in range(3):
            q_goal = rng.uniform(-np.pi, np.pi, 10)
            T_goal = kinematics.pose(planar10.template, jnp.asarray(q_goal), 10)
            inst = planar10.instance(T_goal)
            D_true = true_distance_matrix(planar10, q_goal)
            assert np.all(np.asarray(inst["lb"]) <= D_true + 1e-6)
            assert np.all(D_true <= np.asarray(inst["ub"]) + 1e-6)

    def test_batched_instance(self, ur10):
        key = jax.random.PRNGKey(0)
        q = kinematics.random_configuration(ur10.template, key, (3,))
        T_goal = kinematics.pose(ur10.template, q, 6)
        inst = ur10.instance(T_goal)
        assert inst["D_goal"].shape == (3, 16, 16)
        single = ur10.instance(T_goal[1])
        np.testing.assert_allclose(inst["D_goal"][1], single["D_goal"], atol=1e-12)
        np.testing.assert_allclose(inst["lb"][1], single["lb"], atol=1e-12)


class TestJointVariables:
    def test_roundtrip_ur10(self, ur10):
        """q -> realization -> joint_variables -> q (test_joint_variables.py)."""
        rng = np.random.RandomState(7)
        for _ in range(5):
            q = rng.uniform(-np.pi, np.pi, 6)
            pos = ur10.realization(jnp.asarray(q))
            T_goal = kinematics.pose(ur10.template, jnp.asarray(q), 6)
            q_rec = np.asarray(ur10.joint_variables(pos, T_goal))
            np.testing.assert_allclose(q_rec, q, atol=1e-6)

    def test_roundtrip_random_dh(self):
        rng = np.random.RandomState(8)
        for trial in range(2):
            n = 5  # fixed shape: avoids recompiles
            tpl = revolute_from_dh(
                rng.randn(n), rng.uniform(-np.pi, np.pi, n), rng.randn(n), np.zeros(n)
            )
            ps = ProblemStructure.from_template(tpl)
            q = rng.uniform(-np.pi, np.pi, n)
            pos = ps.realization(jnp.asarray(q))
            T_goal = kinematics.pose(tpl, jnp.asarray(q), n)
            q_rec = np.asarray(ps.joint_variables(pos, T_goal))
            np.testing.assert_allclose(q_rec, q, atol=1e-6)

    def test_roundtrip_planar(self, planar10):
        rng = np.random.RandomState(9)
        for _ in range(5):
            q = rng.uniform(-np.pi, np.pi, 10)
            pos = planar10.realization(jnp.asarray(q))
            q_rec = np.asarray(planar10.joint_variables(pos))
            np.testing.assert_allclose(q_rec, q, atol=1e-6)

    def test_batched_roundtrip(self, ur10):
        key = jax.random.PRNGKey(1)
        q = kinematics.random_configuration(ur10.template, key, (4,))
        pos = ur10.realization(q)
        T_goal = kinematics.pose(ur10.template, q, 6)
        q_rec = ur10.joint_variables(pos, T_goal)
        np.testing.assert_allclose(np.asarray(q_rec), np.asarray(q), atol=1e-6)


class TestObstacles:
    def test_obstacle_arrays(self, ur10):
        ps = ur10.add_spherical_obstacle(np.array([1.0, 1.0, 0.5]), 0.3)
        assert ps.N == 17
        o = ps.idx_obs(0)
        # bounded-below edges to p1..p6
        for i in range(1, 7):
            assert ps.bounded_mask[o, ps.idx_p(i)]
            assert ps.psi_L[o, ps.idx_p(i)] == pytest.approx(0.09)
        # exact anchor edges to base nodes
        assert ps.omega_struct[o, ps.idx_p(0)]
        assert ps.omega_struct[o, ps.idx_x]
        # no bounded edge to p0
        assert not ps.bounded_mask[o, ps.idx_p(0)]

    def test_obstacle_violation_detected(self, ur10):
        # obstacle right at the zero-config elbow: zero config must violate
        tpl = ur10.template
        pos0 = np.asarray(ur10.realization(jnp.zeros(6)))
        p3 = pos0[3]
        ps = ur10.add_spherical_obstacle(p3 + np.array([0.05, 0.0, 0.0]), 0.3)
        viol, ok = ps.check_distance_limits(ps.realization(jnp.zeros(6)))
        assert not bool(ok)
        assert float(viol) > 0.2
