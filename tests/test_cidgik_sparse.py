"""Sparse (chordal) CIDGIK tests.

Reference strategy: constraint residuals vanish at FK-true points
(tests/test_sdp_snl.py:21-91, sparse=True sweeps at 140-258) plus an
end-to-end sparse solve (which the reference suite lacks entirely).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphik_tpu import api
from graphik_tpu.graphs.problem import ProblemStructure
from graphik_tpu.robots import kinematics
from graphik_tpu.solvers import cidgik_sparse as cs
from graphik_tpu.solvers.cidgik import CidgikParams
from tests.test_kinematics import ur10_template


@pytest.fixture(scope="module")
def ur10():
    return ProblemStructure.from_template(ur10_template())


@pytest.fixture(scope="module")
def comp(ur10):
    return cs.compile_cidgik_sparse(ur10)


def lifted_blocks(comp, pos_free):
    """Stacked clique blocks at given free-node positions."""
    d = comp.d
    Z = np.zeros((comp.K, comp.ds, comp.ds))
    for k, c in enumerate(comp.cliques):
        Z[k, :d, :d] = np.eye(d)
        X = pos_free[np.asarray(c)]
        Z[k, d:d + len(c), :d] = X
        Z[k, :d, d:d + len(c)] = X.T
        Z[k, d:d + len(c), d:d + len(c)] = X @ X.T
    return Z


class TestDecomposition:
    def test_cliques_cover_edges(self, ur10, comp):
        """Every exact/bounded free-free edge lies in some clique."""
        free_slot = {int(n): i for i, n in enumerate(comp.free_idx)}
        for a in range(ur10.N):
            for b in range(a + 1, ur10.N):
                if a in free_slot and b in free_slot and (
                    ur10.omega_struct[a, b] or ur10.bounded_mask[a, b]
                ):
                    u, v = free_slot[a], free_slot[b]
                    assert any(
                        u in c and v in c for c in comp.cliques
                    ), (a, b)

    def test_is_actually_sparse(self, comp):
        """The decomposition must be non-trivial: >1 clique, each smaller
        than the free-node set."""
        assert comp.K > 1
        assert comp.smax < comp.n_free

    def test_residuals_zero_at_fk_points(self, ur10, comp):
        rng = np.random.RandomState(0)
        for _ in range(3):
            q = jnp.asarray(rng.uniform(-np.pi, np.pi, 6))
            pos = np.asarray(ur10.realization(q))
            anchors_pos = jnp.asarray(pos[comp.anchor_idx])
            A_eq, b_eq, A_in, lo, hi = cs._constraint_tensors(
                comp, anchors_pos, jnp.float64
            )
            Z = lifted_blocks(comp, pos[comp.free_idx])
            r = np.einsum("mkij,kij->m", np.asarray(A_eq), Z) - np.asarray(
                b_eq
            )
            assert np.abs(r).max() < 1e-8, np.abs(r).max()
            if A_in.shape[0]:
                v = np.einsum("mkij,kij->m", np.asarray(A_in), Z)
                assert np.all(v >= np.asarray(lo) - 1e-6)
                assert np.all(v <= np.asarray(hi) + 1e-6)


class TestEndToEnd:
    def test_ur10_sparse_cidgik_solves(self, ur10, comp):
        T_goal, _ = api.random_goals(ur10, jax.random.PRNGKey(0), (3,))
        out = cs.solve_cidgik_sparse(
            comp, jnp.asarray(T_goal),
            params=CidgikParams(admm_iters=800, max_outer=8),
        )
        e_pos, e_rot = api.pose_error(ur10, out["q"], jnp.asarray(T_goal))
        hits = (np.asarray(e_pos) < 1e-2) & (np.asarray(e_rot) < 1e-2)
        assert hits.sum() >= 2, (e_pos, e_rot, out["eig_sum"], out["feas"])

    def test_rank_forcing_converges(self, ur10, comp):
        """Excess-rank eigenvalue sum reaches ~0 on goals whose SDP solve is
        feasible - the convergence signal of the convex iteration
        (reference convex_iteration.py:246-264). Guards the padded-slot /
        Jacobi-overflow regressions that previously parked eig_sum at
        relax-1 = 0.6 (see cidgik_sparse._solve_sdp_admm_blocks)."""
        T_goal, _ = api.random_goals(ur10, jax.random.PRNGKey(0), (4,))
        out = cs.solve_cidgik_sparse(
            comp, jnp.asarray(T_goal),
            params=CidgikParams(admm_iters=2000, max_outer=30, rel_tol=1e-5),
        )
        eig = np.asarray(out["eig_sum"])
        feasible = np.asarray(out["status"]) == cs.FEASIBLE
        assert np.all(np.isfinite(eig)), eig
        assert feasible.sum() >= 3, (out["feas"], out["status"])
        assert np.all(eig[feasible] < 1e-6), (eig, feasible)

    def test_matches_dense_points(self, ur10, comp):
        """Sparse and dense CIDGIK agree on the recovered positions."""
        from graphik_tpu.solvers import cidgik as cd

        dense = cd.compile_cidgik(ur10)
        T_goal, _ = api.random_goals(ur10, jax.random.PRNGKey(5), (2,))
        p = CidgikParams(admm_iters=800, max_outer=8)
        out_s = cs.solve_cidgik_sparse(comp, jnp.asarray(T_goal), params=p)
        out_d = cd.solve_cidgik(dense, jnp.asarray(T_goal), params=p)
        es_p, _ = api.pose_error(ur10, out_s["q"], jnp.asarray(T_goal))
        ed_p, _ = api.pose_error(ur10, out_d["q"], jnp.asarray(T_goal))
        # both formulations solve the instances (same relaxation)
        assert (np.asarray(es_p) < 2e-2).sum() >= 1
        assert (np.asarray(ed_p) < 2e-2).sum() >= 1


class TestFloorModeSparse:
    """floor_mode on the sparse path (the reference passes floor_mode
    through to both dense and sparse, convex_iteration.py:185-192): p0/q0
    freed from anchoring, planar LMEs stamped into their host cliques."""

    @pytest.fixture(scope="class")
    def fcomp(self, ur10):
        return cs.compile_cidgik_sparse(ur10, floor_mode=True)

    def test_compile_frees_base_and_adds_planar_rows(self, ur10, fcomp):
        base = {int(ur10.idx_p(0)), int(ur10.idx_q(0))}
        assert base <= {int(i) for i in fcomp.free_idx}
        assert not base & {int(i) for i in fcomp.anchor_idx}
        assert len(fcomp.lin_u) == 2
        assert fcomp.n_free == 12  # p0..p5, q0..q5

    def test_residuals_zero_at_fk_points(self, ur10, fcomp):
        """The canonical configuration's base sits ON the floor, so every
        constraint (incl. the planar rows) is satisfied exactly."""
        rng = np.random.RandomState(5)
        q = jnp.asarray(rng.uniform(-np.pi, np.pi, 6))
        pos = np.asarray(ur10.realization(q))
        anchors_pos = jnp.asarray(pos[fcomp.anchor_idx])
        A_eq, b_eq, A_in, lo, hi = cs._constraint_tensors(
            fcomp, anchors_pos, jnp.float64
        )
        Z = lifted_blocks(fcomp, pos[fcomp.free_idx])
        r = np.einsum("mkij,kij->m", np.asarray(A_eq), Z) - np.asarray(b_eq)
        assert np.abs(r).max() < 1e-8, np.abs(r).max()

    def test_solve_keeps_base_on_planes(self, ur10, fcomp):
        """The returned cone-feasible iterate satisfies the planar LMEs:
        z(p0) ~ 0, z(q0) ~ 1 while the base is otherwise free."""
        T_goal, _ = api.random_goals(ur10, jax.random.PRNGKey(3), (2,))
        out = cs.solve_cidgik_sparse(
            fcomp, jnp.asarray(T_goal),
            params=CidgikParams(admm_iters=1000, max_outer=8),
        )
        pts = np.asarray(out["points"], np.float64)
        p0 = pts[:, int(ur10.idx_p(0))]
        q0 = pts[:, int(ur10.idx_q(0))]
        assert np.abs(p0[:, 2]).max() < 2e-2, p0
        assert np.abs(q0[:, 2] - 1.0).max() < 2e-2, q0

        # The gauge fix runs inside solve_cidgik_sparse: T_base is a rigid
        # base pose on the floor and FK(out["q"]) reaches T_base^-1 T_goal.
        Tb = np.asarray(out["T_base"], np.float64)
        R = Tb[:, :3, :3]
        assert np.abs(R @ R.transpose(0, 2, 1) - np.eye(3)).max() < 1e-6
        assert np.abs(Tb[:, 2, 3]).max() < 2e-2
        # T_goal carries a per-end-effector axis (n, 1, 4, 4)
        Tg_base = (
            np.linalg.inv(Tb)[:, None] @ np.asarray(T_goal, np.float64)
        )
        e_pos, e_rot = api.pose_error(ur10, out["q"], jnp.asarray(Tg_base))
        assert ((np.asarray(e_pos) < 2e-2)
                & (np.asarray(e_rot) < 5e-2)).sum() >= 1, (e_pos, e_rot)
