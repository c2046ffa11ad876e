"""Batched SO(2)/SE(2)/SO(3)/SE(3) operations in JAX.

Replaces the reference's `liegroups` dependency (see
/root/reference/graphik/utils/geometry.py:26-43 and robot FK at
/root/reference/graphik/robots/robot_revolute.py:85-103) with closed-form,
batched, jit-friendly array functions.

Conventions
-----------
* Poses are homogeneous matrices: SE(3) -> (..., 4, 4), SE(2) -> (..., 3, 3).
* Twists are ``[v, omega]`` (translation part first), matching liegroups'
  ``SE3.exp`` argument order: SE(3) twists are (..., 6), SE(2) twists (..., 3).
* All functions broadcast over leading batch dimensions.
* Small-angle branches use Taylor expansions selected with `jnp.where` so the
  functions are safe under `jit`/`vmap`/`grad`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Guard against literal division by zero only (value-level, dtype-safe).
_TINY = 1e-9


def _taylor_threshold(dtype):
    """Angle below which Taylor series replace trig closed forms.

    The cancellation error of forms like (theta - sin theta)/theta^3 grows
    as eps/theta^2, so the switch must happen well above sqrt(eps) — in
    float32 that means theta ~ O(1) (switching near eps NaNs/blows up for
    theta in [eps, sqrt(eps)]). In float64 the closed forms are accurate to
    ~1e-11 relative already at theta = 0.1, where the theta^6-order series
    below are exact to eps.
    """
    return 1.0 if jnp.finfo(dtype).eps > 1e-10 else 0.1


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def so3_hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    w = jnp.asarray(w)
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_vee(W):
    """(..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc(theta):
    """sin(theta)/theta, stable at 0 (no cancellation; only the 0/0 guard)."""
    small = jnp.abs(theta) < _TINY
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0, jnp.sin(safe) / safe)


def _cosc(theta):
    """(1 - cos(theta))/theta^2 = 2 sin^2(theta/2)/theta^2, stable everywhere.

    The half-angle form has no cancellation for any theta.
    """
    small = jnp.abs(theta) < _TINY
    safe = jnp.where(small, 1.0, theta)
    s = jnp.sin(safe / 2.0)
    return jnp.where(small, 0.5, 2.0 * (s / safe) * (s / safe))


def _one_minus_sinc_over_sq(theta):
    """(1 - sinc(theta))/theta^2 = (theta - sin theta)/theta^3, stable at 0."""
    t2 = theta * theta
    small = jnp.abs(theta) < _taylor_threshold(jnp.asarray(theta).dtype)
    safe = jnp.where(small, 1.0, theta)
    series = 1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0 - t2 * t2 * t2 / 362880.0
    return jnp.where(small, series, (safe - jnp.sin(safe)) / safe**3)


def so3_exp(w):
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    w = jnp.asarray(w)
    theta = jnp.linalg.norm(w, axis=-1)
    W = so3_hat(w)
    W2 = W @ W
    a = _sinc(theta)[..., None, None]
    b = _cosc(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def quat_from_rotation(R):
    """Unit quaternion (w, x, y, z) from (..., 3, 3) rotation matrices.

    Branchless Shepperd extraction: all four pivot candidates are formed and
    the numerically dominant one selected per element - uniformly accurate
    for every angle (unlike arccos-of-trace, which loses eps/dt^2 near pi).
    """
    R = jnp.asarray(R)
    t = jnp.trace(R, axis1=-2, axis2=-1)
    r00, r11, r22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    a01, a02, a12 = (
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    )
    s01, s02, s12 = (
        R[..., 2, 1] + R[..., 1, 2],
        R[..., 0, 2] + R[..., 2, 0],
        R[..., 1, 0] + R[..., 0, 1],
    )
    pivots = jnp.stack(
        [1.0 + t, 1.0 + 2.0 * r00 - t, 1.0 + 2.0 * r11 - t, 1.0 + 2.0 * r22 - t],
        axis=-1,
    )
    cands = jnp.stack(
        [
            jnp.stack([1.0 + t, a01, a02, a12], axis=-1),
            jnp.stack([a01, 1.0 + 2.0 * r00 - t, s12, s02], axis=-1),
            jnp.stack([a02, s12, 1.0 + 2.0 * r11 - t, s01], axis=-1),
            jnp.stack([a12, s02, s01, 1.0 + 2.0 * r22 - t], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4 components)
    k = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, k[..., None, None], axis=-2)[..., 0, :]
    piv = jnp.take_along_axis(pivots, k[..., None], axis=-1)[..., 0]
    q = q / (2.0 * jnp.sqrt(jnp.maximum(piv, 1e-30)))[..., None]
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 0] < 0, -1.0, 1.0)[..., None]


def so3_log(R):
    """(..., 3, 3) rotation -> (..., 3) axis-angle, via quaternions.

    ||v|| = sin(theta/2), w = cos(theta/2); log = 2 v * (theta/2) / ||v||.
    Trig-free scale factor (||v|| IS sin(theta/2)): well-conditioned for all
    angles, and immune to XLA's reduced-accuracy sin near pi/2.
    """
    q = quat_from_rotation(R)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1)
    half = jnp.arctan2(vn, q[..., 0])
    small = vn < 1e-9
    factor = jnp.where(small, 2.0, 2.0 * half / jnp.where(small, 1.0, vn))
    return v * factor[..., None]


def so3_left_jacobian(w):
    """Left Jacobian J of SO(3): exp((w+dw)^) ~ exp(dw_l^) exp(w^), (...,3)->(...,3,3)."""
    w = jnp.asarray(w)
    theta = jnp.linalg.norm(w, axis=-1)
    W = so3_hat(w)
    W2 = W @ W
    b = _cosc(theta)[..., None, None]
    c = _one_minus_sinc_over_sq(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b * W + c * W2


def so3_inv_left_jacobian(w):
    """Closed-form inverse of the SO(3) left Jacobian."""
    w = jnp.asarray(w)
    theta = jnp.linalg.norm(w, axis=-1)
    W = so3_hat(w)
    W2 = W @ W
    small = theta < _taylor_threshold(jnp.asarray(theta).dtype)
    safe = jnp.where(small, 1.0, theta)
    # coefficient of W2: (1/theta^2)(1 - sinc/(2 cosc)) with stable limit 1/12
    t2 = theta * theta
    series = 1.0 / 12.0 + t2 / 720.0 + t2 * t2 / 30240.0 + t2 * t2 * t2 / 1209600.0
    cot_term = jnp.where(
        small,
        series,
        (1.0 / safe**2) * (1.0 - (_sinc(safe) / (2.0 * _cosc(safe)))),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


def rotx(theta):
    theta = jnp.asarray(theta)
    c, s = jnp.cos(theta), jnp.sin(theta)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero], axis=-1),
            jnp.stack([zero, c, -s], axis=-1),
            jnp.stack([zero, s, c], axis=-1),
        ],
        axis=-2,
    )


def roty(theta):
    theta = jnp.asarray(theta)
    c, s = jnp.cos(theta), jnp.sin(theta)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, zero, s], axis=-1),
            jnp.stack([zero, one, zero], axis=-1),
            jnp.stack([-s, zero, c], axis=-1),
        ],
        axis=-2,
    )


def rotz(theta):
    theta = jnp.asarray(theta)
    c, s = jnp.cos(theta), jnp.sin(theta)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_make(R, t):
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_identity(dtype=jnp.float64):
    return jnp.eye(4, dtype=dtype)


def se3_rot(T):
    return T[..., :3, :3]


def se3_trans(T):
    return T[..., :3, 3]


def se3_inv(T):
    R = se3_rot(T)
    t = se3_trans(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_make(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def se3_exp(xi):
    """(..., 6) twist [v, w] -> (..., 4, 4). Matches liegroups SE3.exp."""
    xi = jnp.asarray(xi)
    v = xi[..., :3]
    w = xi[..., 3:]
    R = so3_exp(w)
    J = so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", J, v)
    return se3_make(R, t)


def se3_log(T):
    """(..., 4, 4) -> (..., 6) twist [v, w]. Matches liegroups SE3.log."""
    w = so3_log(se3_rot(T))
    Jinv = so3_inv_left_jacobian(w)
    v = jnp.einsum("...ij,...j->...i", Jinv, se3_trans(T))
    return jnp.concatenate([v, w], axis=-1)


def se3_adjoint(T):
    """(..., 4, 4) -> (..., 6, 6) adjoint for [v, w]-ordered twists."""
    R = se3_rot(T)
    t = se3_trans(T)
    tR = so3_hat(t) @ R
    z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([z, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_rotz(theta):
    """Pure z-rotation SE(3), matching reference rot_axis(theta, 'z')."""
    theta = jnp.asarray(theta)
    return se3_make(rotz(theta), jnp.zeros(theta.shape + (3,), dtype=theta.dtype))


def se3_trans_axis(d, axis=2, dtype=None):
    """Pure translation along a principal axis (reference trans_axis)."""
    d = jnp.asarray(d, dtype=dtype)
    t = jnp.zeros(d.shape + (3,), dtype=d.dtype).at[..., axis].set(d)
    return se3_make(jnp.eye(3, dtype=d.dtype), t)


def se3_inv_left_jacobian(xi):
    """Inverse left Jacobian of SE(3) for [v, w] twists (liegroups order).

    Used by the joint-space local solver's gradient
    (reference joint_angle_solver.py:77).
    """
    xi = jnp.asarray(xi)
    v = xi[..., :3]
    w = xi[..., 3:]
    Jw_inv = so3_inv_left_jacobian(w)
    Q = _se3_curlyQ(v, w)
    top = jnp.concatenate([Jw_inv, -Jw_inv @ Q @ Jw_inv], axis=-1)
    z = jnp.zeros_like(Jw_inv)
    bottom = jnp.concatenate([z, Jw_inv], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def _se3_curlyQ(rho, w):
    """The Q matrix in the SE(3) left Jacobian (Barfoot, eq. 7.86)."""
    th = jnp.linalg.norm(w, axis=-1)
    W = so3_hat(w)
    V = so3_hat(rho)
    W2 = W @ W
    WV = W @ V
    VW = V @ W
    WVW = WV @ W
    th2 = th * th
    small = th < _taylor_threshold(jnp.asarray(th).dtype)
    safe = jnp.where(small, 1.0, th)
    th4 = th2 * th2
    c2 = _one_minus_sinc_over_sq(th)  # a3 = (th - sin)/th^3, limit 1/6
    # c3 = (th^2/2 + cos - 1)/th^4 = -a4, limit 1/24
    c3 = jnp.where(
        small,
        1.0 / 24.0 - th2 / 720.0 + th4 / 40320.0 - th4 * th2 / 3628800.0,
        (th2 / 2.0 + jnp.cos(safe) - 1.0) / safe**4,
    )
    # c4 = a5 = (th - sin - th^3/6)/th^5, limit -1/120
    c4 = jnp.where(
        small,
        -1.0 / 120.0 + th2 / 5040.0 - th4 / 362880.0 + th4 * th2 / 39916800.0,
        (safe - jnp.sin(safe) - safe**3 / 6.0) / safe**5,
    )
    c2 = c2[..., None, None]
    c3 = c3[..., None, None]
    c4 = c4[..., None, None]
    # Barfoot eq. 7.86: Q = V/2 + a3(WV+VW+WVW) - a4(W^2V+VW^2-3WVW)
    #                     - (a4-3a5)/2 (WVW^2+W^2VW); here c3 = -a4.
    Q = (
        0.5 * V
        + c2 * (WV + VW + WVW)
        + c3 * (W @ WV + VW @ W - 3.0 * WVW)
        + 0.5 * (c3 + 3.0 * c4) * (WVW @ W + W @ WVW)
    )
    return Q


# ---------------------------------------------------------------------------
# SO(2) / SE(2)
# ---------------------------------------------------------------------------

def rot2(theta):
    theta = jnp.asarray(theta)
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def se2_make(R, t):
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (2, 2))
    t = jnp.broadcast_to(t, batch + (2,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 3), dtype=R.dtype).at[..., 0, 2].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se2_identity(dtype=jnp.float64):
    return jnp.eye(3, dtype=dtype)


def se2_rot(T):
    return T[..., :2, :2]


def se2_trans(T):
    return T[..., :2, 2]


def se2_angle(T):
    return jnp.arctan2(T[..., 1, 0], T[..., 0, 0])


def se2_inv(T):
    R = se2_rot(T)
    t = se2_trans(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return se2_make(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def se2_exp(xi):
    """(..., 3) twist [v1, v2, w] -> (..., 3, 3). Matches liegroups SE2.exp."""
    xi = jnp.asarray(xi)
    v = xi[..., :2]
    w = xi[..., 2]
    R = rot2(w)
    a = _sinc(w)
    b = w * _cosc(w)  # (1-cos)/w
    J = jnp.stack(
        [jnp.stack([a, -b], axis=-1), jnp.stack([b, a], axis=-1)], axis=-2
    )
    t = jnp.einsum("...ij,...j->...i", J, v)
    return se2_make(R, t)


def se2_log(T):
    """(..., 3, 3) -> (..., 3) twist [v1, v2, w]."""
    w = se2_angle(T)
    a = _sinc(w)
    b = w * _cosc(w)
    det = a * a + b * b
    Jinv = (
        jnp.stack([jnp.stack([a, b], axis=-1), jnp.stack([-b, a], axis=-1)], axis=-2)
        / det[..., None, None]
    )
    v = jnp.einsum("...ij,...j->...i", Jinv, se2_trans(T))
    return jnp.concatenate([v, w[..., None]], axis=-1)


def se2_adjoint(T):
    """(..., 3, 3) -> (..., 3, 3) adjoint for [v, w]-ordered SE(2) twists."""
    R = se2_rot(T)
    t = se2_trans(T)
    col = jnp.stack([t[..., 1], -t[..., 0]], axis=-1)
    top = jnp.concatenate([R, col[..., :, None]], axis=-1)
    bottom = (
        jnp.zeros(T.shape[:-2] + (1, 3), dtype=T.dtype).at[..., 0, 2].set(1.0)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def wraptopi(theta):
    """Wrap angles to (-pi, pi] (reference utils.py:36)."""
    return jnp.mod(theta + jnp.pi, 2.0 * jnp.pi) - jnp.pi
