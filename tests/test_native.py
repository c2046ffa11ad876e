"""Parity tests: C++ native reference kernels vs the JAX dense cost path.

The native library fills the role of the reference's numba AOT `costgrd`
module (reference: graphik/solvers/costs.py) — an f64 edge-list CPU oracle.
These tests require only g++ (baked into the image); they skip if the
toolchain is genuinely unavailable.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphik_tpu import native
from graphik_tpu.graphs.problem import ProblemStructure
from graphik_tpu.robots import kinematics
from graphik_tpu.robots.templates import planar_from_links
from graphik_tpu.solvers import costs
from tests.test_kinematics import ur10_template

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _problem_arrays(ps, seed):
    rng = np.random.RandomState(seed)
    q_goal = rng.uniform(-np.pi, np.pi, ps.n)
    ee = int(ps.template.ee[0])
    T_goal = kinematics.pose(ps.template, jnp.asarray(q_goal), ee)
    inst = ps.instance(T_goal, smooth=False)
    omega, psi_L, psi_U = ps.masks()
    D_goal = np.asarray(inst["D_goal"], np.float64)
    omega = omega.astype(np.float64)
    L_mask, U_mask = costs.make_masks(omega, psi_L, psi_U)
    L_mask = np.asarray(L_mask, np.float64)
    U_mask = np.asarray(U_mask, np.float64)
    return D_goal, omega, psi_L, psi_U, L_mask, U_mask


@pytest.mark.parametrize("make", ["planar", "ur10"])
@pytest.mark.parametrize("seed", [0, 3])
def test_native_matches_jax(make, seed):
    if make == "planar":
        ps = ProblemStructure.from_template(planar_from_links(np.ones(8)))
    else:
        ps = ProblemStructure.from_template(ur10_template())
    D_goal, omega, psi_L, psi_U, L_mask, U_mask = _problem_arrays(ps, seed)

    ei, ej, om_e, pl_e, pu_e, lm_e, um_e = native.edges_from_masks(
        omega, psi_L, psi_U, L_mask, U_mask
    )
    assert len(ei) > 0
    dgoal_e = D_goal[ei, ej]

    rng = np.random.RandomState(seed + 100)
    B = 5
    Y = rng.randn(B, ps.N, ps.dim)
    Z = rng.randn(B, ps.N, ps.dim)

    # JAX dense path in f64 (conftest enables x64 on CPU).
    args64 = tuple(
        jnp.asarray(a, jnp.float64)
        for a in (D_goal, omega, psi_L, psi_U, L_mask, U_mask)
    )
    Yj = jnp.asarray(Y)
    Zj = jnp.asarray(Z)
    f_ref = np.asarray(jax.vmap(lambda y: costs.cost(y, *args64))(Yj))
    g_ref = np.asarray(jax.vmap(lambda y: costs.egrad(y, *args64))(Yj))
    h_ref = np.asarray(
        jax.vmap(lambda y, z: costs.ehess(y, z, *args64))(Yj, Zj)
    )

    f_nat = native.cost(Y, dgoal_e, ei, ej, om_e, pl_e, pu_e, lm_e, um_e)
    f_nat2, g_nat = native.cost_and_grad(
        Y, dgoal_e, ei, ej, om_e, pl_e, pu_e, lm_e, um_e
    )
    h_nat = native.hess(Y, Z, dgoal_e, ei, ej, om_e, pl_e, pu_e, lm_e, um_e)

    scale = max(1.0, np.abs(f_ref).max())
    np.testing.assert_allclose(f_nat / scale, f_ref / scale, atol=1e-12)
    np.testing.assert_allclose(f_nat2, f_nat, rtol=0, atol=0)
    gs = max(1.0, np.abs(g_ref).max())
    np.testing.assert_allclose(g_nat / gs, g_ref / gs, atol=1e-12)
    hs = max(1.0, np.abs(h_ref).max())
    np.testing.assert_allclose(h_nat / hs, h_ref / hs, atol=1e-12)


def test_native_unbatched_and_broadcast():
    ps = ProblemStructure.from_template(planar_from_links(np.ones(4)))
    D_goal, omega, psi_L, psi_U, L_mask, U_mask = _problem_arrays(ps, 7)
    ei, ej, om_e, pl_e, pu_e, lm_e, um_e = native.edges_from_masks(
        omega, psi_L, psi_U, L_mask, U_mask
    )
    dgoal_e = D_goal[ei, ej]
    rng = np.random.RandomState(1)
    Y = rng.randn(ps.N, ps.dim)
    f1 = native.cost(Y, dgoal_e, ei, ej, om_e, pl_e, pu_e, lm_e, um_e)
    fB = native.cost(
        np.stack([Y, Y]), dgoal_e, ei, ej, om_e, pl_e, pu_e, lm_e, um_e
    )
    assert np.isscalar(f1) or f1.ndim == 0
    np.testing.assert_allclose(fB, [f1, f1])
