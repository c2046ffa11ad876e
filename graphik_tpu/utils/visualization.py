"""Matplotlib visualization (reference utils/robot_visualization.py).

Plots planar manipulators, 3D point-graph realizations with frames, and
heatmaps of solver metrics. matplotlib is imported lazily so headless /
minimal deployments don't pay for it; 3D mesh rendering (the reference's
pyrender path, urdf_visualization.py) is intentionally out of scope - mesh
assets are not part of the kinematic framework.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_planar_robot(ps, q, T_goal=None, ax=None, show_obstacles=True):
    """Draw a planar chain/tree at configuration q
    (robot_visualization.py:95-196)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    pos = np.asarray(ps.realization(np.asarray(q, dtype=float)))
    tpl = ps.template
    for i in range(1, tpl.n + 1):
        par = int(tpl.parents[i])
        ax.plot(
            [pos[par, 0], pos[i, 0]], [pos[par, 1], pos[i, 1]],
            "-o", color="tab:blue", markersize=4,
        )
    ax.plot(pos[0, 0], pos[0, 1], "ks", markersize=8)
    if T_goal is not None:
        Tg = np.asarray(T_goal)
        ax.plot(Tg[0, 2], Tg[1, 2], "r*", markersize=14)
    if show_obstacles:
        for center, radius in ps.obstacles:
            ax.add_patch(
                plt.Circle(center[:2], radius, color="tab:red", alpha=0.3)
            )
    ax.set_aspect("equal")
    return ax


def plot_revolute_points(ps, pos, ax=None, show_aux=True, show_obstacles=True):
    """3D scatter/segment plot of a solved point graph
    (robot_visualization.py:203-252)."""
    plt = _plt()
    if ax is None:
        fig = plt.figure(figsize=(7, 7))
        ax = fig.add_subplot(projection="3d")
    pos = np.asarray(pos)
    tpl = ps.template
    n = tpl.n
    for i in range(1, n + 1):
        par = int(tpl.parents[i])
        ax.plot(
            [pos[par, 0], pos[i, 0]],
            [pos[par, 1], pos[i, 1]],
            [pos[par, 2], pos[i, 2]],
            "-o", color="tab:blue",
        )
    if show_aux:
        for i in range(n + 1):
            p = pos[ps.idx_p(i)]
            qpt = pos[ps.idx_q(i)]
            ax.plot(
                [p[0], qpt[0]], [p[1], qpt[1]], [p[2], qpt[2]],
                "-", color="tab:green", alpha=0.5,
            )
    if show_obstacles:
        u, v = np.mgrid[0 : 2 * np.pi : 12j, 0 : np.pi : 8j]
        for center, radius in ps.obstacles:
            x = center[0] + radius * np.cos(u) * np.sin(v)
            y = center[1] + radius * np.sin(u) * np.sin(v)
            z = center[2] + radius * np.cos(v)
            ax.plot_wireframe(x, y, z, color="tab:red", alpha=0.2)
    return ax


def plot_solve_metrics(out, ax=None):
    """Histogram of per-instance pose errors from a batched solve result
    (the experiments' histogram plots, convex_iteration.py:424-473)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(1, 2, figsize=(10, 4))
    e_pos = np.ravel(np.asarray(out["e_pos"]))
    ax[0].hist(np.log10(np.maximum(e_pos, 1e-12)), bins=40, color="tab:blue")
    ax[0].set_xlabel("log10 position error")
    if "iterations" in out:
        ax[1].hist(np.ravel(np.asarray(out["iterations"])), bins=40, color="tab:orange")
        ax[1].set_xlabel("iterations")
    return ax
