"""Small-matrix linear algebra as straight-line (unrolled) code.

XLA's generic LU/Cholesky lower to data-dependent loops that are expensive
to compile - and slow to run - when nested inside vmapped while-loops on
TPU. The solver hot paths only need tiny SPD solves (the d^2 x d^2 Lyapunov
system, n x n Gauss-Newton steps), so these unrolled versions compile to a
few dozen fused vector ops instead.
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_unrolled(A):
    """Cholesky factor of a small SPD matrix, unrolled over the static size.

    A: (..., m, m) -> lower-triangular L with A = L L^T. The diagonal is
    clamped away from zero so near-singular inputs stay finite (callers add
    their own Tikhonov regularization for semantics).
    """
    m = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(m):
        d = A[..., j, j] - jnp.sum(L[..., j, :j] ** 2, axis=-1)
        d = jnp.sqrt(jnp.maximum(d, 1e-30))
        L = L.at[..., j, j].set(d)
        if j + 1 < m:
            off = A[..., j + 1 :, j] - jnp.einsum(
                "...ik,...k->...i", L[..., j + 1 :, :j], L[..., j, :j]
            )
            L = L.at[..., j + 1 :, j].set(off / d[..., None])
    return L


def chol_solve_unrolled(L, b):
    """Solve A x = b given L = chol_unrolled(A). b: (..., m)."""
    m = L.shape[-1]
    y = jnp.zeros_like(b)
    for i in range(m):
        y = y.at[..., i].set(
            (b[..., i] - jnp.sum(L[..., i, :i] * y[..., :i], axis=-1))
            / L[..., i, i]
        )
    x = jnp.zeros_like(b)
    for i in reversed(range(m)):
        x = x.at[..., i].set(
            (y[..., i] - jnp.sum(L[..., i + 1 :, i] * x[..., i + 1 :], axis=-1))
            / L[..., i, i]
        )
    return x


def spd_solve_unrolled(A, b):
    """x = A^{-1} b for small SPD A (..., m, m), b (..., m)."""
    return chol_solve_unrolled(chol_unrolled(A), b)
