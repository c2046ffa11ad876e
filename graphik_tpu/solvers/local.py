"""Joint-space local solver: batched Levenberg-Marquardt on the pose residual.

TPU-native counterpart of the reference's scipy-SLSQP LocalSolver
(/root/reference/graphik/solvers/joint_angle_solver.py): the cost is the
body-frame pose log residual e = log(T(q)^-1 T_goal) with the analytic
Jacobian J_e = inv_left_jacobian(e) Ad(T^-1) J (joint_angle_solver.py:70-81,
128-150); spherical-obstacle constraints become hinge residuals with
position Jacobians (joint_angle_solver.py:83-126). SLSQP's sequential QPs
are replaced by a damped Gauss-Newton (LM) loop with joint-limit clipping -
fully batched and jittable.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from graphik_tpu.graphs.problem import ProblemStructure
from graphik_tpu.ops.linalg import spd_solve_unrolled
from graphik_tpu.robots import kinematics
from graphik_tpu.utils import lie


@dataclasses.dataclass(frozen=True)
class LocalParams:
    maxiter: int = 100
    lm_init: float = 1e-3
    lm_up: float = 3.0
    lm_down: float = 0.5
    tol_grad: float = 1e-9
    obstacle_weight: float = 10.0
    clip_limits: bool = True


def _pose_residual(tpl, ee, T_goal, q):
    """Body-frame pose residual and its Jacobian: (tw,) / (tw, n)."""
    if tpl.dim == 3:
        T = kinematics.pose(tpl, q, ee)
        J = kinematics.jacobian(tpl, q, ee)  # spatial, (6, n)
        T_inv = lie.se3_inv(T)
        e = lie.se3_log(T_inv @ T_goal)
        J_e = lie.se3_inv_left_jacobian(e) @ lie.se3_adjoint(T_inv) @ J
        # d(e)/dq = -J_e per the chain rule through T(q)
        # (joint_angle_solver.py:79: jac = -2 J_e^T e for cost e^T e)
        return e, -J_e

    # Planar: residual via se2_log; Jacobian by forward-mode AD (n is tiny).
    def res(qq):
        T = kinematics.pose(tpl, qq, ee)
        return lie.se2_log(lie.se2_inv(T) @ T_goal)

    return res(q), jax.jacfwd(res)(q)


def _stacked_pose_residuals(tpl, T_goal, q):
    """Concatenate pose residuals over every end effector.

    T_goal: (n_ee, hd, hd). Returns ((tw * n_ee,), (tw * n_ee, n)).
    """
    es, Js = [], []
    for e_idx, ee in enumerate(tpl.ee):
        e, J = _pose_residual(tpl, int(ee), T_goal[e_idx], q)
        es.append(e)
        Js.append(J)
    return jnp.concatenate(es), jnp.concatenate(Js, axis=0)


def _obstacle_residuals(ps: ProblemStructure, q, weight):
    """Hinge residuals w * max(0, r - ||c - p_i||) per obstacle pair.

    Returns (m,) residuals; Jacobians via jax.jacfwd at the call site.
    """
    if ps.n_obstacles == 0:
        return jnp.zeros((0,), dtype=q.dtype)
    pos = ps.realization(q)
    res = []
    for k, (center, radius) in enumerate(ps.obstacles):
        c = jnp.asarray(center, dtype=q.dtype)
        for i in range(1, ps.n + 1):
            p = pos[..., ps.idx_p(i), :]
            dist = jnp.linalg.norm(c - p, axis=-1)
            res.append(weight * jnp.maximum(radius - dist, 0.0))
    return jnp.stack(res, axis=-1)


def solve_local(
    ps: ProblemStructure,
    T_goal,
    q0,
    params: LocalParams = LocalParams(),
):
    """Batched LM solve over all end effectors.

    T_goal: (..., hd, hd) or (..., n_ee, hd, hd); q0: (..., n).
    Returns dict(q, cost, iterations).
    """
    tpl = ps.template
    dt = jnp.asarray(q0).dtype
    lb = jnp.asarray(tpl.lb[1:], dtype=dt)
    ub = jnp.asarray(tpl.ub[1:], dtype=dt)

    def residuals(q, Tg):
        e, J_e = _stacked_pose_residuals(tpl, Tg, q)
        if ps.n_obstacles:
            r_obs = _obstacle_residuals(ps, q, params.obstacle_weight)
            J_obs = jax.jacfwd(
                lambda qq: _obstacle_residuals(ps, qq, params.obstacle_weight)
            )(q)
            return jnp.concatenate([e, r_obs]), jnp.concatenate([J_e, J_obs], axis=0)
        return e, J_e

    def single(q_init, Tg):
        def cond(s):
            q, lam, k, done = s
            return (~done) & (k < params.maxiter)

        def body(s):
            q, lam, k, done = s
            r, J = residuals(q, Tg)
            g = J.T @ r
            H = J.T @ J + lam * jnp.eye(tpl.n, dtype=dt)
            step = -spd_solve_unrolled(H, g)
            q_new = q + step
            if params.clip_limits:
                q_new = jnp.clip(q_new, lb, ub)
            r_new, _ = residuals(q_new, Tg)
            improved = jnp.sum(r_new**2) < jnp.sum(r**2)
            q_out = jnp.where(improved, q_new, q)
            lam_new = jnp.where(
                improved, lam * params.lm_down, lam * params.lm_up
            )
            lam_new = jnp.clip(lam_new, 1e-12, 1e8)
            done_new = jnp.linalg.norm(g) < params.tol_grad
            return (q_out, lam_new, k + 1, done_new)

        q, lam, k, _ = jax.lax.while_loop(
            cond, body, (q_init, jnp.asarray(params.lm_init, dt), jnp.zeros((), jnp.int32), jnp.zeros((), bool))
        )
        r, _ = residuals(q, Tg)
        return q, jnp.sum(r**2), k

    T_goal = jnp.asarray(T_goal, dtype=dt)
    q0 = jnp.asarray(q0)
    if T_goal.ndim == q0.ndim + 1:  # (..., hd, hd): add the ee axis
        T_goal = T_goal[..., None, :, :]

    fn = single
    for _ in range(q0.ndim - 1):
        fn = jax.vmap(fn)
    with jax.default_matmul_precision("highest"):
        q, cost, iters = fn(q0, T_goal)
    return {"q": q, "cost": cost, "iterations": iters}
