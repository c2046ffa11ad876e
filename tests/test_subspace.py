"""Orthogonal-iteration subspace extraction (ops/subspace.py): oracle
checks vs numpy.linalg.eigh and end-to-end init-path equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from graphik_tpu.ops.subspace import factor_psd_topk, topk_eigh


class TestTopkEigh:
    def test_matches_eigh_psd(self):
        """Exact match on spectra with a gap below the extracted block
        (orthogonal iteration converges at (lam_{k+1}/lam_k)^iters; random
        Wishart spectra have near-degenerate interior gaps where only the
        SUBSPACE, not individual pairs, converges - that case is covered by
        test_subspace_capture below)."""
        rng = np.random.RandomState(0)
        lam_true = np.array([20.0, 12.0, 8.0, 2.0, 1.0, 0.5, 0.2, 0.1])
        mats = []
        for _ in range(6):
            V = np.linalg.qr(rng.randn(8, 8))[0]
            mats.append((V * lam_true) @ V.T)
        A = np.stack(mats)
        lam, Q = topk_eigh(jnp.asarray(A), 3, iters=30, psd=True)
        lam, Q = np.asarray(lam), np.asarray(Q)
        np.testing.assert_allclose(
            lam, np.tile(lam_true[:3], (6, 1)), rtol=1e-6, atol=1e-8
        )
        r = np.einsum("bij,bjk->bik", A, Q) - lam[:, None, :] * Q
        assert np.max(np.abs(r)) < 1e-5 * np.max(np.abs(A))

    def test_subspace_capture_random(self):
        """Random Wishart: the extracted subspace captures (almost) all the
        energy of the true top-k subspace even when interior eigenvalues
        are nearly degenerate."""
        rng = np.random.RandomState(0)
        X = rng.randn(8, 12, 12)
        A = np.einsum("bij,bkj->bik", X, X)
        lam, Q = topk_eigh(jnp.asarray(A), 3, iters=30, psd=True)
        lam = np.asarray(lam)
        ref = np.linalg.eigh(A)[0][:, ::-1][:, :3]
        # Rayleigh values within 1% of the true top-3
        np.testing.assert_allclose(lam, ref, rtol=1e-2)
        assert np.all(lam.sum(axis=-1) >= ref.sum(axis=-1) * 0.995)

    def test_indefinite_shift_selects_algebraic_top(self):
        """Indefinite input: top-k must be the algebraically largest
        eigenvalues, not the largest in magnitude."""
        rng = np.random.RandomState(1)
        V = np.linalg.qr(rng.randn(10, 10))[0]
        lam_true = np.array([-50.0, -8, -3, -1, 0.5, 1, 2, 3, 4, 5.0])
        A = (V * lam_true) @ V.T
        # A dominant negative eigenvalue is the adversarial case for the
        # shifted iteration (the shift compresses the positive ratios), so
        # convergence is slow - the contract here is the algebraic ORDER
        # plus ~1% accuracy, not machine precision.
        lam, _ = topk_eigh(jnp.asarray(A), 3, iters=80)
        np.testing.assert_allclose(
            np.asarray(lam), [5.0, 4.0, 3.0], rtol=1e-2
        )

    def test_orthonormal_columns(self):
        rng = np.random.RandomState(2)
        A = rng.randn(16, 16)
        A = A + A.T
        _, Q = topk_eigh(jnp.asarray(A), 4, iters=15)
        G = np.asarray(Q).T @ np.asarray(Q)
        np.testing.assert_allclose(G, np.eye(4), atol=1e-6)

    def test_factor_psd_topk_reconstructs(self):
        rng = np.random.RandomState(3)
        Xr = rng.randn(5, 14, 3)
        A = np.einsum("bij,bkj->bik", Xr, Xr)  # exactly rank 3
        X = np.asarray(factor_psd_topk(jnp.asarray(A), 3, iters=30))
        np.testing.assert_allclose(
            np.einsum("bij,bkj->bik", X, X), A, rtol=1e-4, atol=1e-6
        )


class TestInitPath:
    def test_subspace_init_quality(self):
        """The subspace init must land the solver in the same basin as the
        full-eigh init: equal success on a small UR10 batch (CPU f64)."""
        from graphik_tpu import api
        from graphik_tpu.robots.library import load_ur10
        from graphik_tpu.solvers.riemannian import (
            TRParams, generate_initialization,
        )

        tpl, ps = load_ur10()
        T_goal, _ = api.random_goals(ps, jax.random.PRNGKey(5), (8,))
        omega, _, _ = ps.masks()
        inst = ps.instance(jnp.asarray(T_goal), smooth=True)
        Y_e = generate_initialization(
            inst["lb"], inst["ub"], jnp.asarray(omega), 3, method="eigh"
        )
        Y_s = generate_initialization(
            inst["lb"], inst["ub"], jnp.asarray(omega), 3, method="subspace"
        )
        assert np.all(np.isfinite(np.asarray(Y_s)))
        # The two inits are not identical but span comparable scatter
        assert 0.5 < float(
            jnp.linalg.norm(Y_s) / jnp.linalg.norm(Y_e)
        ) < 2.0

        out_e = api.solve_ik(
            ps, T_goal, params=TRParams.production(maxiter=150, maxinner=24),
            Y_init=Y_e,
        )
        out_s = api.solve_ik(
            ps, T_goal, params=TRParams.production(maxiter=150, maxinner=24),
            Y_init=Y_s,
        )
        hit_e = np.asarray(out_e["e_pos"]) < 1e-2
        hit_s = np.asarray(out_s["e_pos"]) < 1e-2
        assert hit_s.sum() >= hit_e.sum() - 1, (hit_e, hit_s)
