"""Tree-robot (multi-end-effector) coverage.

Mirrors the reference's 3D tree joint-recovery test
(/root/reference/tests/test_joint_variables.py:192-226: 5-joint tree,
parents p0->p1, p1->{p2,p3}, p2->p4, p3->p5, two end effectors) and adds
what the reference lacks: an end-to-end batched IK solve on the tree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphik_tpu import api
from graphik_tpu.graphs.problem import ProblemStructure
from graphik_tpu.robots import kinematics, templates
from graphik_tpu.robots.templates import dh_to_se3, planar_from_links
from graphik_tpu.solvers.riemannian import TRParams


def tree_template():
    """The reference's 5-joint, 2-end-effector tree (DH tree)."""
    parents = np.array([-1, 0, 1, 1, 2, 3])
    a = {1: 0.0, 2: -0.612, 3: -0.612, 4: -0.5732, 5: -0.5732}
    d = {1: 0.1237, 2: 0.0, 3: 0.0, 4: 0.0, 5: 0.0}
    al = {1: np.pi / 2, 2: 0.0, 3: 0.0, 4: 0.0, 5: 0.0}
    T0 = np.zeros((6, 4, 4))
    T0[0] = np.eye(4)
    for i in range(1, 6):
        T0[i] = T0[parents[i]] @ dh_to_se3(a[i], al[i], d[i], 0.0)
    return templates.revolute_from_t_zero(T0, parents)


@pytest.fixture(scope="module")
def tree():
    return ProblemStructure.from_template(tree_template())


def test_tree_topology(tree):
    tpl = tree.template
    assert list(tpl.ee) == [4, 5]
    assert tree.N == 2 * (tpl.n + 1) + 2


def test_tree_joint_recovery_roundtrip(tree):
    """q -> realization -> joint_variables == q (rtol 1e-5, ref criterion)."""
    tpl = tree.template
    rng = np.random.RandomState(0)
    for _ in range(10):
        q = jnp.asarray(rng.uniform(-np.pi, np.pi, tpl.n))
        pos = tree.realization(q)
        T_goal = kinematics.all_poses(tpl, q)[jnp.asarray(tpl.ee)]
        q_rec = tree.joint_variables(pos, T_goal)
        np.testing.assert_allclose(
            np.asarray(q_rec), np.asarray(q), rtol=1e-5, atol=1e-8
        )


def test_tree_joint_recovery_batched(tree):
    tpl = tree.template
    key = jax.random.PRNGKey(1)
    q = kinematics.random_configuration(tpl, key, (16,))
    pos = tree.realization(q)
    T_goal = kinematics.all_poses(tpl, q)[..., jnp.asarray(tpl.ee), :, :]
    q_rec = tree.joint_variables(pos, T_goal)
    np.testing.assert_allclose(
        np.asarray(q_rec), np.asarray(q), rtol=1e-5, atol=1e-8
    )


def test_tree_end_to_end_solve(tree):
    """Batched IK on the tree: both end-effector goals must be reached.

    The reference has no tree SOLVE test (only joint recovery) - this is
    new coverage. Dual-ee instances are multimodal, so the fleet layer's
    restart pool is the designed mechanism: 3 restarts recover the goals a
    single deterministic init misses.
    """
    from graphik_tpu.parallel.mesh import make_restart_solver

    T_goal, q_goal = api.random_goals(tree, jax.random.PRNGKey(2), (8,))
    assert T_goal.shape[-3] == 2  # two end effectors
    solver = make_restart_solver(
        tree, n_restarts=3, params=TRParams.production(maxiter=300)
    )
    out = solver(jnp.asarray(T_goal), jax.random.PRNGKey(0))
    e_pos = np.asarray(out["e_pos"])
    # At least 7 of 8 tree goals solved to sub-mm (both ees: pose_error
    # takes the max over end effectors).
    assert (e_pos < 1e-3).sum() >= 7, e_pos


def test_planar_tree_roundtrip():
    """Planar tree (reference test_joint_variables.py:113-156 analogue)."""
    parents = np.array([-1, 0, 1, 1, 2, 3])
    lengths = np.ones(5)
    tpl = planar_from_links(lengths, parents=parents)
    ps = ProblemStructure.from_template(tpl)
    assert list(tpl.ee) == [4, 5]
    rng = np.random.RandomState(3)
    for _ in range(10):
        q = jnp.asarray(rng.uniform(-np.pi, np.pi, tpl.n))
        pos = ps.realization(q)
        T_goal = kinematics.all_poses(tpl, q)[jnp.asarray(tpl.ee)]
        q_rec = ps.joint_variables(pos, T_goal)
        np.testing.assert_allclose(
            np.asarray(q_rec), np.asarray(q), rtol=1e-5, atol=1e-8
        )


def test_tree_cidgik_solve(tree):
    """Dense CIDGIK on the dual-ee tree: multi-goal dynamic rows.

    The reference never exercises CIDGIK on trees (its harness is
    UR10-only, convex_iteration.py:322-473) - this covers the multi-ee
    goal-anchor path of the split engine. Branch-level reflections are
    distance-consistent alternate solutions, so (like the Riemannian tree
    solve test above) the criterion is end-effector POSITION; per-branch
    orientation is multimodal on trees.
    """
    from graphik_tpu.solvers import cidgik as cd
    from graphik_tpu.solvers.cidgik import CidgikParams

    comp = cd.compile_cidgik(tree)
    tpl = tree.template
    rng = np.random.RandomState(0)
    qs = [rng.uniform(-np.pi, np.pi, tpl.n) for _ in range(3)]
    T_goal = np.stack([
        np.asarray(
            kinematics.all_poses(tpl, jnp.asarray(q))[jnp.asarray(tpl.ee)]
        )
        for q in qs
    ])
    assert T_goal.shape == (3, 2, 4, 4)
    out = cd.solve_cidgik(
        comp, jnp.asarray(T_goal),
        params=CidgikParams.production(
            admm_iters=600, admm_iters_rest=300, max_outer=8
        ),
    )
    e_pos, _ = api.pose_error(tree, out["q"], jnp.asarray(T_goal))
    assert np.all(np.asarray(out["status"]) == cd.FEASIBLE)
    # max over BOTH end effectors, every instance to sub-mm position
    assert np.all(np.asarray(e_pos) < 1e-3), e_pos
