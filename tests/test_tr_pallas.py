"""Parity tests for the fused Pallas TR solver (ops/tr_pallas.py).

Runs in interpret mode on CPU; the same kernel code path executes compiled
on TPU. Oracle: the dense XLA TR solver (solvers/riemannian.py), itself
property-tested against the reference semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphik_tpu import api
from graphik_tpu.ops import edge as edge_ops
from graphik_tpu.ops.tr_pallas import solve_tr_pallas
from graphik_tpu.robots.library import load_ur10
from graphik_tpu.solvers import riemannian
from graphik_tpu.solvers.costs import make_masks
from graphik_tpu.solvers.riemannian import TRParams


@pytest.fixture(scope="module")
def ur10_problem():
    tpl, ps = load_ur10()
    omega, psi_L, psi_U = ps.masks()
    B = 8
    T_goal, _ = api.random_goals(ps, jax.random.PRNGKey(3), (B,))
    inst = ps.instance(jnp.asarray(T_goal), smooth=True, dtype=jnp.float32)
    Y0 = riemannian.generate_initialization(
        inst["lb"], inst["ub"], jnp.asarray(omega, jnp.float32), ps.dim
    ).astype(jnp.float32)
    D_goal = inst["D_goal"].astype(jnp.float32)
    L_mask, U_mask = make_masks(
        jnp.asarray(omega, jnp.float32),
        jnp.asarray(psi_L, jnp.float32),
        jnp.asarray(psi_U, jnp.float32),
    )
    ep = edge_ops.build_edge_problem(
        omega, psi_L, psi_U,
        np.asarray(L_mask, np.float64), np.asarray(U_mask, np.float64),
        dim=ps.dim,
    )
    return ps, omega, psi_L, psi_U, ep, Y0, D_goal


def _dense_solve(omega, psi_L, psi_U, Y0, D_goal, maxiter):
    return riemannian.solve(
        Y0, D_goal,
        omega.astype(np.float32),
        psi_L.astype(np.float32),
        psi_U.astype(np.float32),
        params=TRParams(maxiter=maxiter, backend="dense"),
    )


def test_one_step_parity(ur10_problem):
    """After a single TR step the kernel matches the XLA path near-exactly."""
    ps, omega, psi_L, psi_U, ep, Y0, D_goal = ur10_problem
    ref = _dense_solve(omega, psi_L, psi_U, Y0, D_goal, maxiter=1)
    out = solve_tr_pallas(
        ep, Y0, ep.edge_values(D_goal), maxiter=1, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out["cost"]), np.asarray(ref["cost"]), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(out["num_inner"]), np.asarray(ref["num_inner"])
    )
    np.testing.assert_allclose(
        np.asarray(out["Y"]), np.asarray(ref["Y"]), rtol=1e-4, atol=1e-5
    )


def test_multi_step_convergence_parity(ur10_problem):
    """Both solvers reach comparable cost after the same iteration budget.

    Trajectories diverge in f32 (different accumulation orders), so assert
    convergence quality, not bitwise equality.
    """
    ps, omega, psi_L, psi_U, ep, Y0, D_goal = ur10_problem
    ref = _dense_solve(omega, psi_L, psi_U, Y0, D_goal, maxiter=40)
    out = solve_tr_pallas(
        ep, Y0, ep.edge_values(D_goal), maxiter=40, interpret=True
    )
    ref_cost = np.asarray(ref["cost"])
    pal_cost = np.asarray(out["cost"])
    # Within 100x of each other per instance at the deep-convergence tail,
    # and the same order of magnitude in the median.
    assert np.median(pal_cost) < 10 * max(np.median(ref_cost), 1e-8)
    assert np.all(pal_cost < 1e-2)


def test_batch_padding_independence(ur10_problem):
    """Lanes are independent: a 3-instance batch (padded to one tile)
    matches the first 3 lanes of the 8-instance batch."""
    ps, omega, psi_L, psi_U, ep, Y0, D_goal = ur10_problem
    dg = ep.edge_values(D_goal)
    full = solve_tr_pallas(ep, Y0, dg, maxiter=5, interpret=True)
    sub = solve_tr_pallas(ep, Y0[:3], dg[:3], maxiter=5, interpret=True)
    np.testing.assert_allclose(
        np.asarray(sub["Y"]), np.asarray(full["Y"])[:3], rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(sub["iterations"]), np.asarray(full["iterations"])[:3]
    )


def test_solve_dispatch_f64_falls_back_to_dense(ur10_problem):
    """backend='pallas' with float64 inputs routes to the dense XLA path
    (the kernel is f32-only); results stay float64."""
    ps, omega, psi_L, psi_U, ep, Y0, D_goal = ur10_problem
    out = riemannian.solve(
        Y0.astype(jnp.float64),
        D_goal.astype(jnp.float64),
        omega, psi_L, psi_U,
        params=TRParams(maxiter=3, backend="pallas"),
    )
    assert out["Y"].dtype == jnp.float64


def test_solve_dispatch_f32_uses_kernel(ur10_problem):
    """backend='pallas' with f32 inputs runs the kernel (interpret off-TPU)
    and matches a direct kernel call."""
    ps, omega, psi_L, psi_U, ep, Y0, D_goal = ur10_problem
    via_solve = riemannian.solve(
        Y0, D_goal, omega, psi_L, psi_U,
        params=TRParams(maxiter=3, backend="pallas"),
    )
    direct = solve_tr_pallas(
        ep, Y0, ep.edge_values(D_goal), maxiter=3, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(via_solve["Y"]), np.asarray(direct["Y"]),
        rtol=1e-6, atol=1e-7,
    )


def test_limit_hinges_active_planar():
    """The kernel handles bound (hinge) edges: a planar chain with tight
    joint limits produces bounded edges, and solutions respect them."""
    from graphik_tpu.robots.library import load_planar_chain

    tpl, ps = load_planar_chain(6, limits=np.pi / 3)
    omega, psi_L, psi_U = ps.masks()
    assert (psi_L > 0).any() or (psi_U > 0).any()
    B = 8
    T_goal, _ = api.random_goals(ps, jax.random.PRNGKey(11), (B,))
    inst = ps.instance(jnp.asarray(T_goal), smooth=True, dtype=jnp.float32)
    Y0 = riemannian.generate_initialization(
        inst["lb"], inst["ub"], jnp.asarray(omega, jnp.float32), ps.dim
    ).astype(jnp.float32)
    D_goal = inst["D_goal"].astype(jnp.float32)
    ep = edge_ops.build_edge_problem(omega, psi_L, psi_U, dim=ps.dim)
    ref = _dense_solve(omega, psi_L, psi_U, Y0, D_goal, maxiter=30)
    out = solve_tr_pallas(
        ep, Y0, ep.edge_values(D_goal), maxiter=30, interpret=True
    )
    assert float(np.median(np.asarray(out["cost"]))) < 10 * max(
        float(np.median(np.asarray(ref["cost"]))), 1e-7
    )
