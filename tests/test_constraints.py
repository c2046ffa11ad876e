"""Constraint-function generation tests (reference tests for
solvers/constraints.py semantics: residuals vanish at FK-true points)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphik_tpu.graphs import constraints as con
from graphik_tpu.graphs.problem import ProblemStructure
from graphik_tpu.robots import kinematics
from graphik_tpu.robots.library import load_ur10, load_planar_chain


@pytest.fixture(scope="module")
def ur10():
    return load_ur10()[1]


def test_equalities_vanish_at_fk(ur10):
    cons = con.constraints_from_structure(ur10)
    eqs = [c for c in cons if c.kind == "eq"]
    assert len(eqs) > 10
    rng = np.random.RandomState(0)
    for _ in range(3):
        q = jnp.asarray(rng.uniform(-np.pi, np.pi, 6))
        pos = ur10.realization(q)
        res, viol = con.violations(eqs, pos, tol=1e-8)
        assert not bool(np.asarray(viol).any()), np.abs(np.asarray(res)).max()


def test_inequalities_hold_at_feasible(ur10):
    cons = con.constraints_from_structure(ur10, include_bounds=True)
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.uniform(-np.pi, np.pi, 6))
    pos = ur10.realization(q)
    res, viol = con.violations(cons, pos, tol=1e-6)
    assert not bool(np.asarray(viol).any())


def test_violations_flag_wrong_points(ur10):
    cons = con.constraints_from_structure(ur10)
    rng = np.random.RandomState(2)
    pos = jnp.asarray(rng.standard_normal((ur10.N, 3)))
    _, viol = con.violations(cons, pos)
    assert bool(np.asarray(viol).any())


def test_angular_constraints_planar():
    tpl, ps = load_planar_chain(5, limits=np.pi / 2)
    cons = con.angular_constraints(ps)
    assert len(cons) == 4  # joints 2..5 have a grandparent
    rng = np.random.RandomState(3)
    # configurations inside the limits satisfy every angular bound
    for _ in range(5):
        q = jnp.asarray(rng.uniform(-np.pi / 2, np.pi / 2, 5))
        pos = ps.realization(q)
        res, viol = con.violations(cons, pos, tol=1e-6)
        assert not bool(np.asarray(viol).any()), np.asarray(res)


def test_nearest_neighbour_cost(ur10):
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.uniform(-np.pi, np.pi, 6))
    pos = np.asarray(con.nearest_points_from_config(ur10, q))
    cost = con.nearest_neighbour_cost(ur10, pos)
    assert float(cost(jnp.asarray(pos))) < 1e-12
    shifted = pos + 0.1
    # all N nodes shifted by 0.1 in each of 3 axes
    expected = ur10.N * 3 * 0.1**2
    np.testing.assert_allclose(float(cost(jnp.asarray(shifted))), expected,
                               rtol=1e-6)
