"""Newton-Schulz PSD projection (ops/linalg.psd_project_ns) oracle tests
and CIDGIK split-vs-vmap engine equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from graphik_tpu.ops.linalg import psd_project_ns


def _psd_project_eigh(W):
    lam, Q = np.linalg.eigh(W)
    return (Q * np.maximum(lam, 0.0)) @ Q.T


class TestNewtonSchulzProjection:
    def test_matches_eigh_generic(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            A = rng.randn(12, 12)
            W = (A + A.T) / 2
            P = np.asarray(psd_project_ns(jnp.asarray(W), iters=20))
            P_ref = _psd_project_eigh(W)
            err = np.abs(P - P_ref).max() / max(np.abs(W).max(), 1.0)
            assert err < 1e-6, err

    def test_near_zero_eigenvalues_bounded_error(self):
        """Eigenvalues far below the norm converge slowly in the sign
        iteration, but their contribution to the projection is bounded by
        |lam|/2 - the documented contract."""
        rng = np.random.RandomState(1)
        V = np.linalg.qr(rng.randn(10, 10))[0]
        lam = np.array([5.0, 3.0, 1.0, 1e-4, -1e-4, -1e-3, -0.5, -1, -2, -4])
        W = (V * lam) @ V.T
        P = np.asarray(psd_project_ns(jnp.asarray(W), iters=14))
        P_ref = _psd_project_eigh(W)
        assert np.abs(P - P_ref).max() < 5e-4  # ~|small lam| scale

    def test_batched_and_psd_output(self):
        rng = np.random.RandomState(2)
        A = rng.randn(16, 9, 9)
        W = (A + np.swapaxes(A, -1, -2)) / 2
        P = np.asarray(psd_project_ns(jnp.asarray(W), iters=20))
        lam_min = np.linalg.eigvalsh(P)[..., 0]
        assert lam_min.min() > -1e-6
        # symmetric
        np.testing.assert_allclose(P, np.swapaxes(P, -1, -2), atol=1e-10)

    def test_zero_rows_invariant(self):
        """Zero padded rows/cols survive the iteration (the sparse clique
        blocks rely on this)."""
        rng = np.random.RandomState(3)
        W = np.zeros((8, 8))
        W[:5, :5] = rng.randn(5, 5)
        W = (W + W.T) / 2
        P = np.asarray(psd_project_ns(jnp.asarray(W), iters=16))
        assert np.abs(P[5:, :]).max() < 1e-12
        assert np.abs(P[:, 5:]).max() < 1e-12


class TestSplitEngineEquivalence:
    def test_split_matches_vmap(self):
        """The static/dynamic split ADMM engine must land the same iterates
        as the per-instance vmap engine (same math, different dataflow)."""
        from graphik_tpu import api
        from graphik_tpu.graphs.problem import ProblemStructure
        from graphik_tpu.solvers import cidgik
        from graphik_tpu.solvers.cidgik import CidgikParams, compile_cidgik
        from tests.test_kinematics import ur10_template

        ps = ProblemStructure.from_template(ur10_template())
        comp = compile_cidgik(ps)
        T_goal, _ = api.random_goals(ps, jax.random.PRNGKey(7), (2,))
        p = CidgikParams(admm_iters=300, max_outer=4)
        out_v = cidgik.solve_cidgik(comp, jnp.asarray(T_goal), params=p,
                                    engine="vmap")
        out_s = cidgik.solve_cidgik(comp, jnp.asarray(T_goal), params=p,
                                    engine="split")
        np.testing.assert_allclose(
            np.asarray(out_s["points"]), np.asarray(out_v["points"]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out_s["feas"]), np.asarray(out_v["feas"]),
            rtol=1e-3, atol=1e-8,
        )
