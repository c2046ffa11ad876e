"""Geometric primitives for limit-edge construction.

Vectorized counterparts of /root/reference/graphik/utils/geometry.py.
These run host-side (numpy in the problem compiler) and device-side; they
are written in jnp but accept numpy inputs.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(x):
    """Skew-symmetric matrix of a 3-vector (geometry.py:19-24)."""
    from graphik_tpu.utils.lie import so3_hat

    return so3_hat(x)


def max_min_distance_revolute(r, P, C, N):
    """Min/max distance from point(s) P to the circle (center C, normal N, radius r).

    The geometric primitive behind joint-limit -> distance-bound conversion
    (geometry.py:45-58). All args broadcast; returns (d_max, d_min).
    """
    P = jnp.asarray(P)
    C = jnp.asarray(C)
    N = jnp.asarray(N)
    delta = P - C
    axial = jnp.sum(N * delta, axis=-1)
    radial = jnp.linalg.norm(jnp.cross(N, delta), axis=-1)
    d_min_sq = axial**2 + (radial - r) ** 2
    d_max_sq = axial**2 + (radial + r) ** 2
    d_min = jnp.sqrt(jnp.maximum(d_min_sq, 0.0))
    d_max = jnp.sqrt(jnp.maximum(d_max_sq, 0.0))
    return d_max, d_min
