"""Unit tests for the Lie-group layer: closed forms vs matrix identities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphik_tpu.utils import lie


def random_twists(key, n, dim=6, scale=2.0):
    return scale * jax.random.normal(key, (n, dim))


class TestSO3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(0)
        w = 2.0 * jax.random.normal(key, (64, 3))
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        R2 = lie.so3_exp(w2)
        np.testing.assert_allclose(R, R2, atol=1e-6)

    def test_exp_is_rotation(self):
        key = jax.random.PRNGKey(1)
        w = 3.0 * jax.random.normal(key, (32, 3))
        R = lie.so3_exp(w)
        eye = jnp.eye(3)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), jnp.broadcast_to(eye, R.shape), atol=1e-7)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-7)

    def test_small_angle(self):
        w = jnp.array([[1e-12, 0.0, 0.0], [0.0, 0.0, 0.0]])
        R = lie.so3_exp(w)
        np.testing.assert_allclose(R[1], jnp.eye(3), atol=1e-9)
        assert not np.any(np.isnan(lie.so3_log(R)))

    def test_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        for theta in [np.pi - 1e-4, np.pi - 1e-6, np.pi - 1e-9, np.pi]:
            w = theta * axis
            R = lie.so3_exp(w)
            w2 = lie.so3_log(R)
            # XLA CPU's f64 sin is only ~1e-9 accurate near pi/2, which
            # bounds the achievable roundtrip accuracy here.
            np.testing.assert_allclose(lie.so3_exp(w2), R, atol=1e-8)
            np.testing.assert_allclose(np.linalg.norm(w2), theta, atol=1e-8)

    def test_left_jacobian_inverse(self):
        key = jax.random.PRNGKey(2)
        w = 2.0 * jax.random.normal(key, (16, 3))
        J = lie.so3_left_jacobian(w)
        Jinv = lie.so3_inv_left_jacobian(w)
        np.testing.assert_allclose(J @ Jinv, jnp.broadcast_to(jnp.eye(3), J.shape), atol=1e-6)

    def test_rotz_matches_exp(self):
        th = jnp.array(0.7)
        np.testing.assert_allclose(
            lie.rotz(th), lie.so3_exp(jnp.array([0.0, 0.0, 0.7])), atol=1e-12
        )


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(3)
        xi = random_twists(key, 64)
        T = lie.se3_exp(xi)
        xi2 = lie.se3_log(T)
        np.testing.assert_allclose(lie.se3_exp(xi2), T, atol=1e-6)

    def test_inv(self):
        key = jax.random.PRNGKey(4)
        T = lie.se3_exp(random_twists(key, 8))
        TT = T @ lie.se3_inv(T)
        np.testing.assert_allclose(TT, jnp.broadcast_to(jnp.eye(4), TT.shape), atol=1e-7)

    def test_adjoint_identity(self):
        # Ad_T xi == log(T exp(xi) T^-1) for small xi
        key = jax.random.PRNGKey(5)
        k1, k2 = jax.random.split(key)
        T = lie.se3_exp(random_twists(k1, 4))
        xi = 1e-4 * jax.random.normal(k2, (4, 6))
        lhs = jnp.einsum("bij,bj->bi", lie.se3_adjoint(T), xi)
        rhs = lie.se3_log(T @ lie.se3_exp(xi) @ lie.se3_inv(T))
        np.testing.assert_allclose(lhs, rhs, atol=1e-6)

    def test_inv_left_jacobian(self):
        # d/dt log(exp(t*dxi) exp(xi)) at t=0 equals Jinv(log) @ dxi
        key = jax.random.PRNGKey(6)
        xi = random_twists(key, 6, scale=1.0)
        Jinv = lie.se3_inv_left_jacobian(xi)
        eps = 1e-7
        for b in range(2):
            dxi = np.random.RandomState(b).randn(6)
            T = lie.se3_exp(xi[b])
            lhs = (lie.se3_log(lie.se3_exp(eps * jnp.asarray(dxi)) @ T) - xi[b]) / eps
            rhs = Jinv[b] @ dxi
            np.testing.assert_allclose(lhs, rhs, atol=1e-5)


class TestSE2:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(7)
        xi = 2.0 * jax.random.normal(key, (64, 3))
        T = lie.se2_exp(xi)
        xi2 = lie.se2_log(T)
        np.testing.assert_allclose(lie.se2_exp(xi2), T, atol=1e-6)

    def test_adjoint_identity(self):
        key = jax.random.PRNGKey(8)
        k1, k2 = jax.random.split(key)
        T = lie.se2_exp(2.0 * jax.random.normal(k1, (4, 3)))
        xi = 1e-5 * jax.random.normal(k2, (4, 3))
        lhs = jnp.einsum("bij,bj->bi", lie.se2_adjoint(T), xi)
        rhs = lie.se2_log(T @ lie.se2_exp(xi) @ lie.se2_inv(T))
        np.testing.assert_allclose(lhs, rhs, atol=1e-6)

    def test_wraptopi(self):
        np.testing.assert_allclose(lie.wraptopi(jnp.array(3 * np.pi / 2)), -np.pi / 2, atol=1e-7)
        np.testing.assert_allclose(lie.wraptopi(jnp.array(-3 * np.pi / 2)), np.pi / 2, atol=1e-7)


def test_jit_and_grad():
    f = jax.jit(lambda w: jnp.sum(lie.se3_exp(jnp.concatenate([w, w]))))
    g = jax.grad(f)(jnp.array([0.1, 0.2, 0.3]))
    assert g.shape == (3,)
    assert not np.any(np.isnan(g))


class TestFloat32SmallAngles:
    """float32 regression: the trig helper closed forms must not be used in
    the cancellation region theta in [eps, sqrt(eps)], where e.g.
    (1 - cos theta)/theta^2 evaluates to 0/theta^2 or NaN in f32 and the
    joint-space LM polish stalls at ~1e-3 pose error (see solvers/local.py).
    """

    def _angles(self):
        return jnp.asarray(
            [0.0, 1e-8, 1e-6, 1e-4, 3e-4, 1e-3, 1e-2, 0.09, 0.11, 0.5, 0.99,
             1.01, 2.0, 3.0],
            dtype=jnp.float32,
        )

    def test_se3_log_exp_roundtrip_small_f32(self):
        th = self._angles()
        axis = jnp.asarray([0.26726124, 0.53452248, 0.80178373], jnp.float32)
        w = th[:, None] * axis
        v = jnp.asarray([[0.3, -0.2, 0.5]], jnp.float32) * jnp.ones_like(w)
        xi = jnp.concatenate([v, w], axis=-1)
        xi2 = lie.se3_log(lie.se3_exp(xi))
        assert np.all(np.isfinite(np.asarray(xi2)))
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=5e-6)

    def test_inv_left_jacobian_finite_f32(self):
        th = self._angles()
        axis = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
        w = th[:, None] * axis
        Ji = lie.so3_inv_left_jacobian(w)
        J = lie.so3_left_jacobian(w)
        assert np.all(np.isfinite(np.asarray(Ji)))
        prod = np.asarray(J @ Ji)
        np.testing.assert_allclose(
            prod, np.broadcast_to(np.eye(3, dtype=np.float32), prod.shape),
            atol=2e-6,
        )

    def test_se3_inv_left_jacobian_finite_f32(self):
        th = self._angles()
        axis = jnp.asarray([0.26726124, 0.53452248, 0.80178373], jnp.float32)
        w = th[:, None] * axis
        v = jnp.asarray([[0.3, -0.2, 0.5]], jnp.float32) * jnp.ones_like(w)
        xi = jnp.concatenate([v, w], axis=-1)
        out = lie.se3_inv_left_jacobian(xi)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_f64_precision_preserved(self):
        th = jnp.asarray([1e-3, 0.05, 0.09, 0.11, 0.3, 1.0, 2.0], jnp.float64)
        axis = jnp.asarray([0.26726124, 0.53452248, 0.80178373], jnp.float64)
        w = th[:, None] * axis
        v = jnp.asarray([[0.3, -0.2, 0.5]], jnp.float64) * jnp.ones_like(w)
        xi = jnp.concatenate([v, w], axis=-1)
        xi2 = lie.se3_log(lie.se3_exp(xi))
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-13)
