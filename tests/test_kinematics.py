"""FK / Jacobian tests: product-of-exponentials vs direct DH chains and
finite differences (reference oracle style, tests/test_distance_matrix.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from graphik_tpu.robots import kinematics, templates
from graphik_tpu.robots.templates import (
    dh_to_se3,
    planar_from_links,
    revolute_from_dh,
)

# UR10 DH constants (reference roboturdf.py:378-383)
UR10_A = [0, -0.612, -0.5723, 0, 0, 0]
UR10_D = [0.1273, 0, 0, 0.1639, 0.1157, 0.0922]
UR10_AL = [np.pi / 2, 0, 0, np.pi / 2, -np.pi / 2, 0]
UR10_TH = [0, 0, 0, 0, 0, 0]


def ur10_template():
    return revolute_from_dh(UR10_A, UR10_AL, UR10_D, UR10_TH)


def dh_fk_numpy(a, alpha, d, theta, q):
    """Direct DH chain FK at joint angles q (theta offsets + q)."""
    T = np.eye(4)
    out = [T]
    for i in range(len(a)):
        T = T @ dh_to_se3(a[i], alpha[i], d[i], theta[i] + q[i])
        out.append(T.copy())
    return np.array(out)


class TestRevoluteFK:
    def test_zero_config_matches_T0(self):
        tpl = ur10_template()
        T = kinematics.all_poses(tpl, jnp.zeros(6))
        np.testing.assert_allclose(T, tpl.T0, atol=1e-7)

    def test_fk_matches_dh_chain(self):
        tpl = ur10_template()
        rng = np.random.RandomState(0)
        for _ in range(5):
            q = rng.uniform(-np.pi, np.pi, 6)
            T = np.asarray(kinematics.all_poses(tpl, jnp.asarray(q)))
            T_ref = dh_fk_numpy(UR10_A, UR10_AL, UR10_D, UR10_TH, q)
            np.testing.assert_allclose(T, T_ref, atol=1e-6)

    def test_random_dh_chains(self):
        # fixed n: every new chain length costs a full recompile on this
        # slow-compile CPU sandbox
        rng = np.random.RandomState(1)
        for trial in range(3):
            n = 5
            a = rng.randn(n)
            d = rng.randn(n)
            al = rng.uniform(-np.pi, np.pi, n)
            th = rng.uniform(-np.pi, np.pi, n)
            tpl = revolute_from_dh(a, al, d, th)
            q = rng.uniform(-np.pi, np.pi, n)
            T = np.asarray(kinematics.all_poses(tpl, jnp.asarray(q)))
            T_ref = dh_fk_numpy(a, al, d, th, q)
            np.testing.assert_allclose(T, T_ref, atol=1e-6)

    def test_batched_consistency(self):
        tpl = ur10_template()
        q = jax.random.uniform(jax.random.PRNGKey(0), (7, 6), minval=-3, maxval=3)
        T_batch = kinematics.all_poses(tpl, q)
        for b in range(7):
            np.testing.assert_allclose(
                T_batch[b], kinematics.all_poses(tpl, q[b]), atol=1e-12
            )

    def test_tree_robot(self):
        # 5 nodes: 0 -> 1 -> 2, 1 -> 3 -> 4 (two end effectors)
        rng = np.random.RandomState(2)
        n = 4
        parents = np.array([-1, 0, 1, 1, 3])
        T0 = np.zeros((5, 4, 4))
        T0[0] = np.eye(4)
        for i in range(1, 5):
            T0[i] = T0[parents[i]] @ dh_to_se3(
                rng.rand(), rng.uniform(-1, 1), rng.rand(), rng.uniform(-1, 1)
            )
        tpl = templates.revolute_from_t_zero(T0, parents)
        assert set(map(int, tpl.ee)) == {2, 4}
        q = rng.uniform(-np.pi, np.pi, 4)
        T = np.asarray(kinematics.all_poses(tpl, jnp.asarray(q)))
        # manual check for node 4: path 0->1->3->4
        from graphik_tpu.utils import lie

        E = lambda i, qq: np.asarray(lie.se3_exp(jnp.asarray(tpl.S[i] * qq)))
        T4 = E(0, q[0]) @ E(1, q[2]) @ E(3, q[3]) @ tpl.T0[4]
        np.testing.assert_allclose(T[4], T4, atol=1e-6)


class TestPlanarFK:
    def test_chain_positions(self):
        tpl = planar_from_links(np.ones(4))
        q = jnp.asarray([0.3, -0.5, 1.0, 0.2])
        T = np.asarray(kinematics.all_poses(tpl, q))
        # direct accumulation
        pts = [np.zeros(2)]
        heading = 0.0
        for i in range(4):
            heading += float(q[i])
            pts.append(pts[-1] + np.array([np.cos(heading), np.sin(heading)]))
        for i in range(5):
            np.testing.assert_allclose(T[i, :2, 2], pts[i], atol=1e-6)


class TestJacobian:
    def _fd_jacobian(self, tpl, q, node, eps=1e-7):
        """Finite-difference spatial Jacobian: dT/dq_i T^-1 as a twist."""
        from graphik_tpu.utils import lie

        J = np.zeros((6 if tpl.dim == 3 else 3, tpl.n))
        T = np.asarray(kinematics.pose(tpl, jnp.asarray(q), node))
        for i in range(tpl.n):
            qp = np.array(q)
            qp[i] += eps
            Tp = np.asarray(kinematics.pose(tpl, jnp.asarray(qp), node))
            dT = (Tp - T) / eps
            twist_mat = dT @ np.linalg.inv(T)
            if tpl.dim == 3:
                J[:3, i] = twist_mat[:3, 3]
                J[3:, i] = [twist_mat[2, 1], twist_mat[0, 2], twist_mat[1, 0]]
            else:
                J[:2, i] = twist_mat[:2, 2]
                J[2, i] = twist_mat[1, 0]
        return J

    def test_ur10_jacobian_fd(self):
        tpl = ur10_template()
        rng = np.random.RandomState(3)
        q = rng.uniform(-np.pi, np.pi, 6)
        J = np.asarray(kinematics.jacobian(tpl, jnp.asarray(q), 6))
        J_fd = self._fd_jacobian(tpl, q, 6)
        np.testing.assert_allclose(J, J_fd, atol=1e-5)

    def test_planar_jacobian_fd(self):
        tpl = planar_from_links(np.ones(5))
        rng = np.random.RandomState(4)
        q = rng.uniform(-np.pi, np.pi, 5)
        J = np.asarray(kinematics.jacobian(tpl, jnp.asarray(q), 5))
        J_fd = self._fd_jacobian(tpl, q, 5)
        np.testing.assert_allclose(J, J_fd, atol=1e-5)
