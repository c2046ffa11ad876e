"""JIT-hygiene / sanitizer tests (SURVEY.md section 5).

The reference has no concurrency so "sanitizers" translate here to:
jit-vs-eager consistency (tracing must not change results), NaN
containment on degenerate inputs (failures are VALUES, never exceptions
or silent NaN propagation), and eigensolver robustness on adversarial
matrices (the round-3 Jacobi overflow regression).
"""

import numpy as np
import jax
import jax.numpy as jnp

from graphik_tpu import api
from graphik_tpu.ops.jacobi import jacobi_eigh
from graphik_tpu.robots import library
from graphik_tpu.solvers.riemannian import TRParams


def test_jit_vs_eager_consistency():
    """The solve pipeline must give identical results traced and eager."""
    ps = library.load_planar_chain(6, limits=np.pi / 2)[1]
    T_goal, _ = api.random_goals(ps, jax.random.PRNGKey(11), (3,))
    p = TRParams(maxiter=40)
    eager = api.solve_ik(ps, T_goal, params=p)
    jitted = jax.jit(lambda T: api.solve_ik(ps, T, params=p))(T_goal)
    for k in ("q", "e_pos", "e_rot", "cost"):
        # Tracing changes fusion and therefore rounding at the ~1e-9 level
        # on this CPU; assert agreement at 1e-6 (the environment's trig
        # noise floor), which still catches real trace-divergence bugs.
        np.testing.assert_allclose(
            np.asarray(eager[k]), np.asarray(jitted[k]), atol=1e-6,
            err_msg=k,
        )


def test_no_nan_on_degenerate_goals():
    """Degenerate goals (origin, unreachable, exact zero-config pose) must
    produce finite outputs with failure signalled by value."""
    ps = library.load_ur10()[1]
    tpl = ps.template
    from graphik_tpu.robots import kinematics

    T_zero_cfg = kinematics.all_poses(tpl, jnp.zeros(tpl.n))[
        int(tpl.ee[0])
    ]
    T_origin = jnp.eye(4)
    T_far = jnp.eye(4).at[:3, 3].set(jnp.asarray([10.0, 0.0, 0.0]))
    T_goal = jnp.stack([T_origin, T_far, T_zero_cfg])[:, None]  # (3, 1 ee,...)
    out = api.solve_ik(ps, T_goal, params=TRParams(maxiter=60))
    for k in ("q", "e_pos", "e_rot", "cost", "gradnorm"):
        assert np.all(np.isfinite(np.asarray(out[k]))), k
    # the unreachable goal fails by value, not by exception
    assert np.asarray(out["e_pos"])[1] > 1.0


def test_jacobi_eigh_adversarial():
    """Exact-zero rows + large diagonal gaps overflowed the Givens angle to
    inf and sign(inf) -> NaN before the round-3 fix; batched stacks with
    padded blocks must stay finite and accurate."""
    rng = np.random.default_rng(0)
    mats = []
    for _ in range(8):
        A = rng.normal(size=(9, 9))
        A = A + A.T
        A[5:, :] = 0.0
        A[:, 5:] = 0.0
        A[0, 0] = 40.0  # large gap vs the exact-zero off-diagonals
        mats.append(A)
    Z = jnp.asarray(np.stack(mats))
    lam, Q = jacobi_eigh(Z, sweeps=12)
    assert bool(jnp.isfinite(lam).all() and jnp.isfinite(Q).all())
    ref = np.linalg.eigvalsh(np.asarray(Z))
    np.testing.assert_allclose(np.sort(np.asarray(lam), axis=-1), ref,
                               atol=1e-9)
    # eigenvectors reconstruct the matrix
    recon = jnp.einsum("kij,kj,klj->kil", Q, lam, Q)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(Z), atol=1e-9)
