"""Tests for the distance-geometry core: EDM round trips, MDS, bound smoothing.

Bound smoothing is property-tested like the reference
(tests/test_bound_smoothing.py): lb^2 <= D_true <= ub^2 elementwise at
feasible configurations.
"""

import numpy as np
import jax
import jax.numpy as jnp

from graphik_tpu.utils import dgp


def random_points(key, n, d):
    return jax.random.normal(key, (n, d))


class TestEDM:
    def test_distance_matrix_from_pos(self):
        key = jax.random.PRNGKey(0)
        Y = random_points(key, 10, 3)
        D = dgp.distance_matrix_from_pos(Y)
        Yn = np.asarray(Y)
        D_ref = ((Yn[:, None, :] - Yn[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(D, D_ref, atol=1e-10)

    def test_gram_roundtrip(self):
        key = jax.random.PRNGKey(1)
        Y = random_points(key, 12, 3)
        Y = Y - jnp.mean(Y, axis=0)  # Gram of centered points
        D = dgp.distance_matrix_from_pos(Y)
        G = dgp.gram_from_distance_matrix(D)
        np.testing.assert_allclose(G, Y @ Y.T, atol=1e-9)
        np.testing.assert_allclose(dgp.distance_matrix_from_gram(G), D, atol=1e-9)

    def test_batched(self):
        key = jax.random.PRNGKey(2)
        Y = jax.random.normal(key, (5, 8, 3))
        D = dgp.distance_matrix_from_pos(Y)
        for b in range(5):
            np.testing.assert_allclose(
                D[b], dgp.distance_matrix_from_pos(Y[b]), atol=1e-12
            )


class TestMDS:
    def test_mds_recovers_points(self):
        key = jax.random.PRNGKey(3)
        Y = random_points(key, 10, 3)
        D = dgp.distance_matrix_from_pos(Y)
        X = dgp.mds(dgp.gram_from_distance_matrix(D))
        # X has N columns; energy should live in the first 3
        assert np.linalg.norm(X[:, 3:]) < 1e-6
        D2 = dgp.distance_matrix_from_pos(X)
        np.testing.assert_allclose(D2, D, atol=1e-8)

    def test_linear_projection(self):
        key = jax.random.PRNGKey(4)
        Y = random_points(key, 10, 3)
        # embed in 5D with tiny noise in extra dims
        Y5 = jnp.concatenate([Y, 1e-8 * random_points(jax.random.PRNGKey(5), 10, 2)], axis=1)
        F = np.ones((10, 10)) - np.eye(10)
        P = dgp.linear_projection(Y5, F, 3)
        D = dgp.distance_matrix_from_pos(Y)
        D2 = dgp.distance_matrix_from_pos(P)
        np.testing.assert_allclose(D2, D, atol=1e-6)


class TestBestFit:
    def test_recovers_rigid_transform(self):
        rng = np.random.RandomState(0)
        A = rng.randn(8, 3)
        # random rotation
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = rng.randn(3)
        B = A @ q.T + t
        R, tt = dgp.best_fit_transform(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(R, q, atol=1e-9)
        np.testing.assert_allclose(tt, t, atol=1e-9)


class TestBoundSmoothing:
    def _chain_instance(self, n=6, seed=0):
        """A chain of unit links with exact consecutive distances and an
        exact anchor to the end: classic bound-smoothing setup."""
        rng = np.random.RandomState(seed)
        # random planar chain configuration
        angles = rng.uniform(-np.pi, np.pi, n)
        pts = np.zeros((n + 1, 2))
        heading = 0.0
        for i in range(n):
            heading += angles[i]
            pts[i + 1] = pts[i] + [np.cos(heading), np.sin(heading)]
        N = n + 1
        L = np.zeros((N, N))
        U = np.zeros((N, N))
        mask = np.zeros((N, N), dtype=bool)
        for i in range(n):
            d = np.linalg.norm(pts[i + 1] - pts[i])
            for a, b in [(i, i + 1), (i + 1, i)]:
                L[a, b] = U[a, b] = d
                mask[a, b] = True
        # anchor first-last exact
        d = np.linalg.norm(pts[-1] - pts[0])
        L[0, -1] = L[-1, 0] = U[0, -1] = U[-1, 0] = d
        mask[0, -1] = mask[-1, 0] = True
        return pts, L, U, mask

    def test_bounds_valid(self):
        for seed in range(10):
            pts, L, U, mask = self._chain_instance(seed=seed)
            lb, ub = dgp.bound_smoothing(L, U, mask)
            lb, ub = np.asarray(lb), np.asarray(ub)
            D = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
            assert np.all(lb <= D + 1e-9), f"seed {seed}: lower bound violated"
            assert np.all(D <= ub + 1e-9), f"seed {seed}: upper bound violated"
            # exact edges must stay pinned
            np.testing.assert_allclose(ub[mask], U[mask], atol=1e-9)

    def test_triangle_upper(self):
        # 3 nodes, two edges of length 1: upper bound on the third must be 2
        L = np.zeros((3, 3))
        U = np.zeros((3, 3))
        mask = np.zeros((3, 3), dtype=bool)
        for a, b in [(0, 1), (1, 2)]:
            L[a, b] = L[b, a] = U[a, b] = U[b, a] = 1.0
            mask[a, b] = mask[b, a] = True
        lb, ub = dgp.bound_smoothing(L, U, mask)
        np.testing.assert_allclose(ub[0, 2], 2.0, atol=1e-9)
        np.testing.assert_allclose(lb[0, 2], 0.0, atol=1e-9)

    def test_lower_propagation(self):
        # 0-1 exact 1.0; 1-2 bounded [3, 4]: then dist(0,2) >= 3 - 1 = 2
        L = np.zeros((3, 3))
        U = np.zeros((3, 3))
        mask = np.zeros((3, 3), dtype=bool)
        L[0, 1] = L[1, 0] = U[0, 1] = U[1, 0] = 1.0
        L[1, 2] = L[2, 1] = 3.0
        U[1, 2] = U[2, 1] = 4.0
        mask[0, 1] = mask[1, 0] = mask[1, 2] = mask[2, 1] = True
        lb, ub = dgp.bound_smoothing(L, U, mask)
        np.testing.assert_allclose(lb[0, 2], 2.0, atol=1e-9)
        np.testing.assert_allclose(ub[0, 2], 5.0, atol=1e-9)

    def test_batched_jit(self):
        pts, L, U, mask = self._chain_instance()
        Lb = jnp.stack([jnp.asarray(L)] * 3)
        Ub = jnp.stack([jnp.asarray(U)] * 3)
        f = jax.jit(lambda l, u: dgp.bound_smoothing(l, u, jnp.asarray(mask)))
        lb, ub = f(Lb, Ub)
        lb1, ub1 = dgp.bound_smoothing(L, U, mask)
        np.testing.assert_allclose(lb[1], lb1, atol=1e-12)
        np.testing.assert_allclose(ub[2], ub1, atol=1e-12)
