"""CIDGIK tests: constraint residuals at FK-true points (reference
tests/test_sdp_snl.py strategy) and end-to-end convex-iteration solves.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphik_tpu import api
from graphik_tpu.graphs.problem import ProblemStructure
from graphik_tpu.robots import kinematics
from graphik_tpu.solvers import cidgik
from graphik_tpu.solvers.cidgik import CidgikParams, compile_cidgik
from tests.test_kinematics import ur10_template


@pytest.fixture(scope="module")
def ur10():
    return ProblemStructure.from_template(ur10_template())


@pytest.fixture(scope="module")
def comp(ur10):
    return compile_cidgik(ur10)


def lifted_from_points(comp, X_free):
    d = comp.d
    s = comp.s
    Z = np.zeros((s, s))
    Z[:d, :d] = np.eye(d)
    Z[d:, :d] = X_free
    Z[:d, d:] = X_free.T
    Z[d:, d:] = X_free @ X_free.T
    return Z


class TestConstraints:
    def test_residuals_zero_at_fk_points(self, ur10, comp):
        """tr(A Z) - b = 0 at FK-true configurations (test_sdp_snl.py:21-91)."""
        rng = np.random.RandomState(0)
        for _ in range(3):
            q = rng.uniform(-np.pi, np.pi, 6)
            T_goal = kinematics.pose(ur10.template, jnp.asarray(q), 6)
            pos = np.asarray(ur10.realization(jnp.asarray(q)))

            anchors_pos = jnp.asarray(pos[comp.anchor_idx])
            A_eq, b_eq, A_in, lo, hi = cidgik._constraint_matrices(
                comp, anchors_pos, jnp.float64
            )
            Z = lifted_from_points(comp, pos[comp.free_idx])
            r = np.einsum("mij,ij->m", np.asarray(A_eq), Z) - np.asarray(b_eq)
            assert np.abs(r).max() < 1e-8, np.abs(r).max()

            # inequalities hold at feasible configurations
            v = np.einsum("mij,ij->m", np.asarray(A_in), Z)
            assert np.all(v >= np.asarray(lo) - 1e-6)
            assert np.all(v <= np.asarray(hi) + 1e-6)

    def test_counts(self, comp):
        assert comp.n_free == 10  # p1..p5, q1..q5
        assert comp.m_eq > 20
        assert comp.m_in > 0


class TestEndToEnd:
    def test_ur10_cidgik_solves(self, ur10, comp):
        """Convex iteration recovers configurations reaching the goal pose.

        The reference has no automated CIDGIK solver assertion
        (SURVEY.md section 4) - this is stronger than the reference suite.
        """
        key = jax.random.PRNGKey(0)
        T_goal, _ = api.random_goals(ur10, key, (3,))
        out = cidgik.solve_cidgik(
            comp, jnp.asarray(T_goal),
            params=CidgikParams(admm_iters=600, max_outer=8),
        )
        e_pos, e_rot = api.pose_error(ur10, out["q"], jnp.asarray(T_goal))
        # raw-ADMM sanity floor: the relaxation lands at least one goal at
        # cm accuracy (CIDGIK's success rate is below 100% even with MOSEK)
        hits = (np.asarray(e_pos) < 1e-2) & (np.asarray(e_rot) < 1e-2)
        assert hits.sum() >= 1, (e_pos, e_rot, out["eig_sum"], out["feas"])

        # production pipeline (ADMM + GN polish, as bench.py runs it):
        # at least 2/3 goals at the BASELINE criterion (1 mm / 1 deg),
        # and those goals essentially at machine precision.
        from graphik_tpu.solvers import local as local_solver
        from graphik_tpu.solvers.local import LocalParams

        pol = local_solver.solve_local(
            ur10, jnp.asarray(T_goal), out["q"], LocalParams(maxiter=60)
        )
        e_pos_p, e_rot_p = api.pose_error(ur10, pol["q"], jnp.asarray(T_goal))
        e_pos_p, e_rot_p = np.asarray(e_pos_p), np.asarray(e_rot_p)
        mm = (e_pos_p < 1e-3) & (e_rot_p < np.deg2rad(1.0))
        assert mm.sum() >= 2, (e_pos_p, e_rot_p)
        # The typical polished goal reaches machine precision; individual
        # goals may legitimately settle anywhere under the mm criterion, so
        # assert the median rather than every element.
        assert np.median(e_pos_p[mm]) < 1e-6, e_pos_p

    def test_status_infeasible_for_unreachable(self, ur10, comp):
        T_far = np.eye(4)
        T_far[:3, 3] = [10.0, 0.0, 0.0]
        out = cidgik.solve_cidgik(
            comp, jnp.asarray(T_far), params=CidgikParams(admm_iters=300)
        )
        assert int(out["status"]) == cidgik.INFEASIBLE


class TestPlanarCidgik:
    """Planar CIDGIK (reference sdp_snl.py:854-871, convex_iteration planar).

    The reference has no planar CIDGIK test; ours asserts the full pipeline.
    """

    def test_planar_chain_solves(self):
        from graphik_tpu.robots.library import load_planar_chain

        tpl, ps = load_planar_chain(6)
        comp = compile_cidgik(ps)
        assert comp.d == 2
        T_goal, _ = api.random_goals(ps, jax.random.PRNGKey(1), (3,))
        out = cidgik.solve_cidgik(
            comp, jnp.asarray(T_goal),
            params=CidgikParams(admm_iters=600, max_outer=8),
        )
        e_pos, e_rot = api.pose_error(ps, out["q"], jnp.asarray(T_goal))
        hits = (np.asarray(e_pos) < 1e-2) & (np.asarray(e_rot) < 1e-2)
        assert hits.sum() >= 2, (e_pos, e_rot, out["eig_sum"], out["feas"])


class TestNearestPointSdp:
    """solve_nearest_point_sdp (reference sdp_snl.py:810-851 +
    tests/test_sdp_snl.py:94-137 cost-map strategy)."""

    def test_feasible_targets_are_fixed_points(self, ur10, comp):
        """If the targets already satisfy all equalities (FK-true points),
        the nearest-point SDP returns them unchanged."""
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.uniform(-np.pi, np.pi, 6))
        pos = np.asarray(ur10.realization(q))
        anchors_pos = pos[comp.anchor_idx]
        targets = pos[comp.free_idx]
        out = cidgik.solve_nearest_point_sdp(
            comp, jnp.asarray(anchors_pos), jnp.asarray(targets),
            params=CidgikParams(admm_iters=800),
        )
        assert float(out["feas"]) < 1e-4
        np.testing.assert_allclose(
            np.asarray(out["points"]), targets, atol=5e-3
        )

    def test_infeasible_targets_project_to_constraint_set(self, ur10, comp):
        """Perturbed targets project back: equalities hold at the output."""
        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.uniform(-np.pi, np.pi, 6))
        pos = np.asarray(ur10.realization(q))
        anchors_pos = pos[comp.anchor_idx]
        targets = pos[comp.free_idx] + 0.05 * rng.standard_normal((comp.n_free, 3))
        out = cidgik.solve_nearest_point_sdp(
            comp, jnp.asarray(anchors_pos), jnp.asarray(targets),
            params=CidgikParams(admm_iters=1500),
        )
        assert float(out["feas"]) < 1e-3
        # distance equalities hold at the projected points (the SDP is a
        # relaxation: check the free-free edges via the Gram block)
        Z = np.asarray(out["Z"])
        d = comp.d
        for (u, v), b in zip(comp.eq_ff, comp.eq_ff_b):
            duv = Z[d + u, d + u] + Z[d + v, d + v] - 2 * Z[d + u, d + v]
            np.testing.assert_allclose(duv, b, atol=5e-3)

    def test_cost_matrix_values(self, comp):
        """tr(C Z(points)) + sum||p||^2 == sum ||x_u - p_u||^2 exactly."""
        rng = np.random.RandomState(3)
        targets = rng.standard_normal((comp.n_free, 3))
        X = rng.standard_normal((comp.n_free, 3))
        Z = lifted_from_points(comp, X)
        C = np.asarray(cidgik.nearest_point_cost_matrix(comp, jnp.asarray(targets)))
        val = np.sum(C * Z) + np.sum(targets**2)
        np.testing.assert_allclose(
            val, np.sum((X - targets) ** 2), rtol=1e-9
        )


class TestIterationSchedule:
    """Warm-started (long, short) outer schedule (CidgikParams.admm_iters_rest,
    split engine): a fraction of the cold budget per warm round must land
    the same basins as the flat schedule."""

    def test_rest_schedule_matches_flat(self, ur10, comp):
        T_goal, _ = api.random_goals(ur10, jax.random.PRNGKey(3), (3,))
        flat = cidgik.solve_cidgik(
            comp, jnp.asarray(T_goal),
            params=CidgikParams(admm_iters=600, max_outer=6),
        )
        sched = cidgik.solve_cidgik(
            comp, jnp.asarray(T_goal),
            params=CidgikParams(admm_iters=600, admm_iters_rest=200,
                                max_outer=6),
        )
        e_flat, _ = api.pose_error(ur10, flat["q"], jnp.asarray(T_goal))
        e_sched, _ = api.pose_error(ur10, sched["q"], jnp.asarray(T_goal))
        # same basins: scheduled errors within 3x of flat (both ~cm-level
        # raw ADMM accuracy; the production pipeline polishes either)
        assert np.all(np.asarray(e_sched) < np.maximum(
            3.0 * np.asarray(e_flat), 5e-2
        )), (e_flat, e_sched)


class TestProductionParams:
    """CidgikParams.production(): the tuned serving point (round-5 sweep).

    rho=10 with the row-normalized split operator is the dominant raw-
    accuracy lever - raw @1cm 0.57 -> 0.80 on dense UR10 at identical
    per-iteration cost (tools/cidgik_raw_accuracy_sweep.py)."""

    def test_fields_and_overrides(self):
        p = CidgikParams.production()
        assert (p.rho, p.admm_iters, p.admm_iters_rest) == (10.0, 1000, 500)
        assert p.cone_ns_iters == 16 and p.max_outer == 10
        assert CidgikParams.production(max_outer=3).max_outer == 3

    def test_rho10_beats_rho1_raw_accuracy(self, ur10, comp):
        T_goal, _ = api.random_goals(ur10, jax.random.PRNGKey(9), (6,))
        budget = dict(admm_iters=300, admm_iters_rest=150, max_outer=5,
                      cone_ns_iters=16)
        lo = cidgik.solve_cidgik(
            comp, jnp.asarray(T_goal), params=CidgikParams(**budget)
        )
        hi = cidgik.solve_cidgik(
            comp, jnp.asarray(T_goal),
            params=CidgikParams(rho=10.0, **budget),
        )
        e_lo, _ = api.pose_error(ur10, lo["q"], jnp.asarray(T_goal))
        e_hi, _ = api.pose_error(ur10, hi["q"], jnp.asarray(T_goal))
        assert float(np.median(np.asarray(e_hi))) <= float(
            np.median(np.asarray(e_lo))
        ), (e_lo, e_hi)


class TestFloorMode:
    """floor_mode (convex_iteration.py:185-192 + add_planar_constraints,
    sdp_snl.py:854-871): the base nodes p0/q0 are freed from anchoring and
    constrained to their canonical horizontal planes (z=0 / z=1) instead,
    so the base may slide/yaw on the floor while the goal anchors pin the
    end effector. The reference has no floor_mode test; ours closes the
    loop through gauge realignment + joint extraction."""

    @pytest.fixture(scope="class")
    def fcomp(self, ur10):
        return compile_cidgik(ur10, floor_mode=True)

    def test_compile_frees_base_and_adds_planar_rows(self, ur10, fcomp):
        base = {int(ur10.idx_p(0)), int(ur10.idx_q(0))}
        assert base <= {int(i) for i in fcomp.free_idx}
        assert not base & {int(i) for i in fcomp.anchor_idx}
        assert len(fcomp.lin_u) == 2
        assert fcomp.n_free == 12  # p0..p5, q0..q5

    def test_residuals_zero_at_fk_points(self, ur10, fcomp):
        """The canonical configuration has its base ON the floor, so every
        constraint (incl. the two planar rows) is satisfied exactly."""
        rng = np.random.RandomState(5)
        q = rng.uniform(-np.pi, np.pi, 6)
        pos = np.asarray(ur10.realization(jnp.asarray(q)))
        anchors_pos = jnp.asarray(pos[fcomp.anchor_idx])
        A_eq, b_eq, A_in, lo, hi = cidgik._constraint_matrices(
            fcomp, anchors_pos, jnp.float64
        )
        Z = lifted_from_points(fcomp, pos[fcomp.free_idx])
        r = np.einsum("mij,ij->m", np.asarray(A_eq), Z) - np.asarray(b_eq)
        assert np.abs(r).max() < 1e-8, np.abs(r).max()

    def test_solve_reaches_goal_with_floating_base(self, ur10, fcomp):
        n = 3
        T_goal, _ = api.random_goals(ur10, jax.random.PRNGKey(3), (n,))
        T_goal = np.asarray(T_goal, np.float64)
        out = cidgik.solve_cidgik(
            fcomp, jnp.asarray(T_goal),
            params=CidgikParams(admm_iters=1000, max_outer=8),
        )
        pts = np.asarray(out["points"], np.float64)
        ip0, iq0 = int(ur10.idx_p(0)), int(ur10.idx_q(0))
        p0, q0 = pts[:, ip0], pts[:, iq0]
        # planar LMEs hold on the returned (cone-feasible) iterate
        assert np.abs(p0[:, 2]).max() < 2e-2, p0
        assert np.abs(q0[:, 2] - 1.0).max() < 2e-2, q0

        # Gauge realignment: express each solution in its own solved base
        # frame (origin p0, z-axis q0-p0, arbitrary yaw - the UR10's first
        # joint rotates about base z, so yaw is absorbed by q1), then
        # extract joint angles and check FK reproduces the transformed
        # goal - i.e. the floating-base solution really reaches the pose.
        pos_fixed = np.asarray(ur10.pos_fixed, np.float64)
        ix, iy = int(ur10.idx_x), int(ur10.idx_y)
        P_list, Tg_list = [], []
        for b in range(n):
            z = q0[b] - p0[b]
            z = z / np.linalg.norm(z)
            r = np.array([1.0, 0.0, 0.0])
            if abs(z @ r) > 0.9:
                r = np.array([0.0, 1.0, 0.0])
            x = r - (r @ z) * z
            x = x / np.linalg.norm(x)
            y = np.cross(z, x)
            R = np.stack([x, y, z], axis=1)
            T_base = np.eye(4)
            T_base[:3, :3] = R
            T_base[:3, 3] = p0[b]
            P = (pts[b] - p0[b]) @ R
            P[ix] = pos_fixed[ix]
            P[iy] = pos_fixed[iy]
            P_list.append(P)
            Tg_list.append(np.linalg.inv(T_base) @ T_goal[b])
        P = jnp.asarray(np.stack(P_list))
        Tg = jnp.asarray(np.stack(Tg_list))
        q = ur10.joint_variables(P, Tg)
        e_pos, e_rot = api.pose_error(ur10, q, Tg)
        hits = (np.asarray(e_pos) < 2e-2) & (np.asarray(e_rot) < 5e-2)
        assert hits.sum() >= 2, (e_pos, e_rot, out["eig_sum"], out["feas"])

    def test_library_q_matches_hand_realignment(self, ur10, fcomp):
        """solve_cidgik applies the gauge fix itself: out["q"] is extracted
        in the solved base frame and out["T_base"] maps it back to the
        world, so T_base^-1 @ T_goal is reached by FK(out["q"])."""
        n = 3
        T_goal, _ = api.random_goals(ur10, jax.random.PRNGKey(3), (n,))
        T_goal = np.asarray(T_goal, np.float64)
        out = cidgik.solve_cidgik(
            fcomp, jnp.asarray(T_goal),
            params=CidgikParams(admm_iters=1000, max_outer=8),
        )
        Tb = np.asarray(out["T_base"], np.float64)
        # T_base is a rigid pose with the base on the floor plane
        R = Tb[:, :3, :3]
        assert np.abs(R @ R.transpose(0, 2, 1) - np.eye(3)).max() < 1e-6
        assert np.abs(Tb[:, 2, 3]).max() < 2e-2  # origin at z ~ 0
        # T_goal carries a per-end-effector axis (n, 1, 4, 4)
        Tg_base = np.linalg.inv(Tb)[:, None] @ T_goal
        e_pos, e_rot = api.pose_error(ur10, out["q"], jnp.asarray(Tg_base))
        hits = (np.asarray(e_pos) < 2e-2) & (np.asarray(e_rot) < 5e-2)
        assert hits.sum() >= 2, (e_pos, e_rot)

    def test_anchored_solve_returns_identity_T_base(self, ur10, comp):
        T_goal, _ = api.random_goals(ur10, jax.random.PRNGKey(9), (2,))
        out = cidgik.solve_cidgik(
            comp, T_goal, params=CidgikParams(admm_iters=50, max_outer=1),
        )
        Tb = np.asarray(out["T_base"])
        assert np.array_equal(Tb, np.broadcast_to(np.eye(4), Tb.shape))
