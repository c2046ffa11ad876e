"""Fused Pallas TPU kernel: the ENTIRE Riemannian trust-region solve.

The XLA formulation of the batched TR solver (solvers/riemannian.py) spends
its time on dispatch: each tCG inner iteration is ~40 tiny HLO ops over
(B, N, d) tensors with N ~ 16, so the chip is idle between ops. This kernel
instead runs the complete outer-TR + truncated-CG loop for a tile of
instances entirely inside VMEM: instances live on the lane axis, points on
the sublane axis, and every step is a handful of vector ops plus two small
MXU matmuls - per-iteration cost drops from ~1 ms to ~1 us per 128-lane tile.

Algorithm parity: trust_region.py:112-599 in the reference (outer loop,
Steihaug-Toint tCG, rho regularization, radius updates) and the quotient
manifold projection of fixed_rank_psd_sym.py:91-113 - reduced here from the
reference's 9x9 unrolled solve to a 3x3 SPD solve by exploiting that the
Lyapunov solution Om is antisymmetric (see solvers/riemannian.manifold_proj).

Cost convention matches ops/edge.py (= solvers/costs.py): the per-edge
squared-residual sum with the reference's 1/2-consistent gradient scaling;
all backends are parity-tested against each other.

Layout per grid step (one batch tile of TB lanes):
    C      (Ep, N)    signed incidence, broadcast over lanes
    Ct     (N, Ep)    its transpose
    par    (Ep, 8)    [omega, psi_L, psi_U, L_mask, U_mask, 0, 0, 0]
    dg     (Ep, TB)   per-instance squared goal distances on edges
    Y      (d*N, TB)  stacked coordinate blocks Y_k = Y[kN:(k+1)N]
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from graphik_tpu.ops.edge import EdgeProblem, _pack_params

_LANE = 128

# tCG stop reasons (trust_region.py:68-83); mirrored in solvers/riemannian.py
_NEGATIVE_CURVATURE = 0
_EXCEEDED_TR = 1
_MAX_INNER_ITER = 4


def _dot(a, b):
    return jnp.dot(
        a, b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _rowsum(x):
    return jnp.sum(x, axis=0, keepdims=True)  # (R, TB) -> (1, TB)


def _tr_kernel(
    c_ref, ct_ref, par_ref, dg_ref, *rest_refs,
    N: int, d: int, maxiter: int, maxinner: int, mingradnorm: float,
    kappa: float, theta: float, rho_prime: float, rho_regularization: float,
    Delta_bar: float, Delta0: float, mininner: int, has_anchors: bool,
    a_nsel: int = 0, a_R: int = 0,
    plateau_every: int = 0, plateau_rtol: float = 0.0,
    plateau_atol: float = 0.0, res_tol: float = 0.0,
):
    f32 = jnp.float32
    C = c_ref[:]          # (Ep, N)
    Ct = ct_ref[:]        # (N, Ep)
    om = par_ref[:, 0:1]
    psiL = par_ref[:, 1:2]
    psiU = par_ref[:, 2:3]
    Lm = par_ref[:, 3:4]
    Um = par_ref[:, 4:5]
    dg = dg_ref[:]        # (Ep, TB)
    if has_anchors:
        ap_ref, apt_ref, apar_ref, y0_ref, act_ref, yout_ref, stats_ref = (
            rest_refs
        )
        # Grid layout (a_nsel > 0): AP is the (pad8(a_nsel), N) DISTINCT-node
        # one-hot; expansion to the (Ap, TB) anchor rows is a sublane
        # broadcast and the scatter-back a block row-sum - the (Ap, N)
        # matmuls this replaces dominate obstacle-rich scenes.
        AP = ap_ref[:]
        APt = apt_ref[:]
        apsiL = apar_ref[:, 0:1]
        apsiU = apar_ref[:, 1:2]
        aLm = apar_ref[:, 2:3]
        aUm = apar_ref[:, 3:4]
        acen = [apar_ref[:, 4 + k:5 + k] for k in range(d)]  # (Ap, 1) each

        if a_nsel:
            # Deliberately UNROLLED over the a_nsel groups: code size grows
            # linearly with the number of distinct anchored robot nodes
            # (bounded by the joint count, <= ~20), but each group lowers to
            # a plain sublane broadcast / row-sum. The reshape-based
            # alternative ((a_nsel, 1, TB) -> broadcast -> merge into the
            # sublane dim) measured 8x SLOWER end-to-end on the table scene
            # (12.4 s vs 1.55 s per 4096 batch) - Mosaic lowers the
            # sublane-merging reshape into element shuffles.
            def a_expand(Yk):
                """(N, TB) -> (Ap, TB): per-group broadcast of node rows."""
                Ysel = _dot(AP, Yk)  # (pad8(a_nsel), TB)
                return jnp.concatenate(
                    [jnp.broadcast_to(Ysel[g:g + 1], (a_R, Ysel.shape[1]))
                     for g in range(a_nsel)], axis=0)

            def a_reduce(w):
                """(Ap, TB) -> (N, TB): block row-sums then tiny scatter."""
                gs = [_rowsum(w[g * a_R:(g + 1) * a_R])
                      for g in range(a_nsel)]
                n_sel_p = AP.shape[0]
                if n_sel_p > a_nsel:
                    gs.append(jnp.zeros((n_sel_p - a_nsel, w.shape[1]),
                                        w.dtype))
                return _dot(APt, jnp.concatenate(gs, axis=0))
        else:
            a_expand = lambda Yk: _dot(AP, Yk)
            a_reduce = lambda w: _dot(APt, w)
    else:
        y0_ref, act_ref, yout_ref, stats_ref = rest_refs
    active = act_ref[:] > 0.0   # (1, TB)
    Y0 = y0_ref[:]        # (dN, TB)
    TB = Y0.shape[1]

    eps = jnp.asarray(np.finfo(np.float32).eps, f32)

    def blocks(Y):
        return [Y[k * N:(k + 1) * N, :] for k in range(d)]

    def edge_diffs(Y):
        return [_dot(C, Yk) for Yk in blocks(Y)]

    def cost_terms(dY):
        dist = dY[0] * dY[0]
        for k in range(1, d):
            dist = dist + dY[k] * dY[k]
        s0 = om * (dg - dist)
        e1 = Lm * jnp.maximum(psiL - dist, 0.0)
        e2 = Um * jnp.maximum(dist - psiU, 0.0)
        return s0, e1, e2

    def anchor_diffs(Y):
        return [a_expand(Yk) - acen[k] for k, Yk in enumerate(blocks(Y))]

    def anchor_terms(adY):
        adist = adY[0] * adY[0]
        for k in range(1, d):
            adist = adist + adY[k] * adY[k]
        a1 = aLm * jnp.maximum(apsiL - adist, 0.0)
        a2 = aUm * jnp.maximum(adist - apsiU, 0.0)
        return a1, a2

    if res_tol > 0.0:
        # Per-lane scale floor for the relative-residual stop: the mean
        # equality-edge squared length (solvers/costs.residual_max).
        eq_cnt = jnp.maximum(_rowsum(om * jnp.ones_like(om)), 1.0)  # (1, 1)
        r_floor = _rowsum(om * dg) / eq_cnt  # (1, TB)

    def res_max(s0, e1, e2, a1=None, a2=None):
        """Max relative residual per lane (1, TB); transient intermediates
        only - the (Ep/Ap, TB) weight tensors are never loop-persistent."""
        r = jnp.abs(s0) / jnp.maximum(dg, r_floor)
        r = jnp.maximum(r, e1 / jnp.maximum(psiL, r_floor))
        r = jnp.maximum(r, e2 / jnp.maximum(psiU, r_floor))
        rmax = jnp.max(r, axis=0, keepdims=True)
        if a1 is not None:
            ra = jnp.maximum(
                a1 / jnp.maximum(apsiL, r_floor),
                a2 / jnp.maximum(apsiU, r_floor),
            )
            rmax = jnp.maximum(rmax, jnp.max(ra, axis=0, keepdims=True))
        return rmax

    def cost_and_grad(Y):
        """f (1, TB), grad (dN, TB), rmax (1, TB) - edge convention
        (ops/edge.py); rmax is 0 when the residual stop is disabled."""
        dY = edge_diffs(Y)
        s0, e1, e2 = cost_terms(dY)
        f = _rowsum(s0 * s0 + e1 * e1 + e2 * e2)
        s = s0 + e1 - e2
        gk = [-2.0 * _dot(Ct, s * dYk) for dYk in dY]
        a1 = a2 = None
        if has_anchors:
            adY = anchor_diffs(Y)
            a1, a2 = anchor_terms(adY)
            f = f + _rowsum(a1 * a1 + a2 * a2)
            sa = a1 - a2
            for k in range(d):
                gk[k] = gk[k] - 2.0 * a_reduce(sa * adY[k])
        if res_tol > 0.0:
            rmax = res_max(s0, e1, e2, a1, a2)
        else:
            rmax = jnp.zeros_like(f)
        return f, jnp.concatenate(gk, axis=0), rmax

    def gram_scalars(Y):
        """Unique entries of X = Y^T Y as (1, TB) rows: x11,x22,x33,x12,x13,x23."""
        Yk = blocks(Y)
        out = []
        for i in range(d):
            out.append(_rowsum(Yk[i] * Yk[i]))
        for i in range(d):
            for j in range(i + 1, d):
                out.append(_rowsum(Yk[i] * Yk[j]))
        return out

    def chol3(m11, m12, m13, m22, m23, m33):
        """Unrolled 3x3 Cholesky over lane rows."""
        l11 = jnp.sqrt(jnp.maximum(m11, 1e-30))
        l21 = m12 / l11
        l31 = m13 / l11
        l22 = jnp.sqrt(jnp.maximum(m22 - l21 * l21, 1e-30))
        l32 = (m23 - l31 * l21) / l22
        l33 = jnp.sqrt(jnp.maximum(m33 - l31 * l31 - l32 * l32, 1e-30))
        return l11, l21, l31, l22, l32, l33

    def chol3_solve(L, b1, b2, b3):
        l11, l21, l31, l22, l32, l33 = L
        y1 = b1 / l11
        y2 = (b2 - l21 * y1) / l22
        y3 = (b3 - l31 * y1 - l32 * y2) / l33
        x3 = y3 / l33
        x2 = (y2 - l32 * x3) / l22
        x1 = (y1 - l21 * x2 - l31 * x3) / l11
        return x1, x2, x3

    def proj_factors(Y):
        """Per-outer-iteration factorization of the reduced Lyapunov system."""
        if d == 2:
            x11, x22, x12 = gram_scalars(Y)
            reg = 10.0 * eps * (x11 + x22 + 1e-30)
            return (x11 + x22 + reg,)
        x11, x22, x33, x12, x13, x23 = gram_scalars(Y)
        reg = 10.0 * eps * (x11 + x22 + x33 + 1e-30)
        # M = [[x11+x22, x23, -x13], [x23, x11+x33, x12], [-x13, x12, x22+x33]]
        return chol3(
            x11 + x22 + reg, x23, -x13, x11 + x33 + reg, x12, x22 + x33 + reg
        )

    def proj(Y, H, fac):
        """Horizontal projection H - Y Om; Om antisymmetric from the
        Lyapunov system (solvers/riemannian.manifold_proj)."""
        Yk = blocks(Y)
        Hk = blocks(H)
        if d == 2:
            c12 = _rowsum(Yk[0] * Hk[1] - Hk[0] * Yk[1])
            a = c12 / fac[0]
            P0 = Hk[0] + a * Yk[1]
            P1 = Hk[1] - a * Yk[0]
            return jnp.concatenate([P0, P1], axis=0)
        c12 = _rowsum(Yk[0] * Hk[1] - Hk[0] * Yk[1])
        c13 = _rowsum(Yk[0] * Hk[2] - Hk[0] * Yk[2])
        c23 = _rowsum(Yk[1] * Hk[2] - Hk[1] * Yk[2])
        a, b, c = chol3_solve(fac, c12, c13, c23)
        # Om = [[0, a, b], [-a, 0, c], [-b, -c, 0]]; P = H - Y Om
        P0 = Hk[0] + a * Yk[1] + b * Yk[2]
        P1 = Hk[1] - a * Yk[0] + c * Yk[2]
        P2 = Hk[2] - b * Yk[0] - c * Yk[1]
        return jnp.concatenate([P0, P1, P2], axis=0)

    def make_hvp(Y):
        """Riemannian Hessian-vector product at fixed Y (precomputed terms)."""
        dY = edge_diffs(Y)
        s0, e1, e2 = cost_terms(dY)
        s = s0 + e1 - e2
        m = om + Lm * (e1 > 0).astype(f32) + Um * (e2 > 0).astype(f32)
        fac = proj_factors(Y)
        if has_anchors:
            adY = anchor_diffs(Y)
            a1, a2 = anchor_terms(adY)
            sa = a1 - a2
            ma = aLm * (a1 > 0).astype(f32) + aUm * (a2 > 0).astype(f32)

        def hvp(Z):
            dZ = edge_diffs(Z)
            dD = dY[0] * dZ[0]
            for k in range(1, d):
                dD = dD + dY[k] * dZ[k]
            dD = 2.0 * dD
            mdD = m * dD
            Hk = [2.0 * _dot(Ct, mdD * dY[k] - s * dZ[k]) for k in range(d)]
            if has_anchors:
                adZ = [a_expand(Zk) for Zk in blocks(Z)]
                adD = adY[0] * adZ[0]
                for k in range(1, d):
                    adD = adD + adY[k] * adZ[k]
                amdD = ma * 2.0 * adD
                for k in range(d):
                    Hk[k] = Hk[k] + 2.0 * a_reduce(
                        amdD * adY[k] - sa * adZ[k]
                    )
            return proj(Y, jnp.concatenate(Hk, axis=0), fac)

        return hvp

    def inner12(a, b):
        return _rowsum(a * b)

    # ---------------- truncated CG (trust_region.py:436-599) ----------------
    # All loop-carried lane masks are f32 0/1 (Mosaic rejects i1 vectors in
    # scf loop carries); comparisons stay local to each body.
    def tcg(hvp, grad, Delta, outer_done_f):
        r0 = grad
        r_r0 = inner12(r0, r0)
        norm_r0 = jnp.sqrt(r_r0)
        if theta == 1.0:
            pow_r0 = norm_r0
        else:
            pow_r0 = norm_r0 ** theta
        target = norm_r0 * jnp.minimum(pow_r0, kappa)

        zero_v = jnp.zeros_like(grad)
        init = (
            jnp.zeros((), jnp.int32),                   # j
            zero_v,                                     # eta
            zero_v,                                     # Heta
            r0,                                         # r
            -r0,                                        # delta
            jnp.zeros((1, TB), f32),                    # e_Pe
            jnp.zeros((1, TB), f32),                    # e_Pd
            r_r0,                                       # d_Pd
            r_r0,                                       # z_r
            jnp.full((1, TB), float(_MAX_INNER_ITER), f32),  # stop
            outer_done_f,                               # tdone (f32 0/1)
            jnp.zeros((1, TB), f32),                    # steps taken
        )

        def cond(st):
            j = st[0]
            tdone_f = st[10]
            return (j < maxinner) & (jnp.sum(1.0 - tdone_f) > 0.0)

        def body(st):
            (j, eta, Heta, r, delta, e_Pe, e_Pd, d_Pd, z_r, stop, tdone_f,
             nsteps) = st
            upd = tdone_f == 0.0
            Hdelta = hvp(delta)
            d_Hd = inner12(delta, Hdelta)
            alpha = z_r / d_Hd
            e_Pe_new = e_Pe + 2.0 * alpha * e_Pd + alpha * alpha * d_Pd

            Dsq = Delta * Delta
            hit_boundary = (
                (d_Hd <= 0.0)
                | (e_Pe_new >= Dsq)
                | ~jnp.isfinite(alpha)
                | ~jnp.isfinite(e_Pe_new)
            )
            disc = jnp.maximum(e_Pd * e_Pd + d_Pd * (Dsq - e_Pe), 0.0)
            tau = (-e_Pd + jnp.sqrt(disc)) / d_Pd
            eta_b = eta + tau * delta
            Heta_b = Heta + tau * Hdelta
            stop_b = jnp.where(
                d_Hd <= 0.0,
                float(_NEGATIVE_CURVATURE),
                float(_EXCEEDED_TR),
            )

            new_eta = eta + alpha * delta
            new_Heta = Heta + alpha * Hdelta
            r_new = r + alpha * Hdelta
            r_r = inner12(r_new, r_new)
            norm_r = jnp.sqrt(r_r)
            reached = (j >= mininner) & (norm_r <= target)

            beta = r_r / z_r
            delta_new = -r_new + beta * delta
            e_Pd_new = beta * (e_Pd + alpha * d_Pd)
            d_Pd_new = r_r + beta * beta * d_Pd

            take_boundary = upd & hit_boundary
            take_target = upd & (~hit_boundary) & reached

            def sel(cond_, x, y):
                return jnp.where(cond_, x, y)

            eta_out = sel(take_boundary, eta_b, new_eta)
            Heta_out = sel(take_boundary, Heta_b, new_Heta)
            eta_out = sel(upd, eta_out, eta)
            Heta_out = sel(upd, Heta_out, Heta)

            done_now = take_boundary | take_target
            stop_out = jnp.where(
                take_boundary, stop_b, jnp.where(take_target, 2.0, stop)
            )
            tdone_new = jnp.maximum(tdone_f, done_now.astype(f32))
            cont = upd & ~done_now

            return (
                j + 1,
                eta_out,
                Heta_out,
                sel(cont, r_new, r),
                sel(cont, delta_new, delta),
                sel(cont, e_Pe_new, e_Pe),
                sel(cont, e_Pd_new, e_Pd),
                sel(cont, d_Pd_new, d_Pd),
                sel(cont, r_r, z_r),
                stop_out,
                tdone_new,
                nsteps + upd.astype(f32),
            )

        out = jax.lax.while_loop(cond, body, init)
        eta, Heta, stop, nsteps = out[1], out[2], out[9], out[11]
        return eta, Heta, stop, nsteps

    # ---------------- outer TR loop (trust_region.py:112-434) --------------
    fx0, g0, rmax0 = cost_and_grad(Y0)
    norm_g0 = jnp.sqrt(inner12(g0, g0))
    done0 = (~active) | (norm_g0 < mingradnorm)
    if res_tol > 0.0:
        done0 = done0 | (rmax0 < res_tol)
    done0 = done0.astype(f32)

    carry0 = (
        jnp.zeros((), jnp.int32),          # k (global)
        Y0,
        fx0,
        g0,
        norm_g0,
        jnp.full((1, TB), Delta0, f32),    # Delta
        done0,                             # done (f32 0/1)
        jnp.zeros((1, TB), f32),           # iters (per lane)
        jnp.zeros((1, TB), f32),           # num_inner (per lane)
        fx0,                               # fx_ref (plateau checkpoint)
        rmax0,                             # max relative residual
    )

    def ocond(st):
        k = st[0]
        done_f = st[6]
        return (k < maxiter) & (jnp.sum(1.0 - done_f) > 0.0)

    def obody(st):
        (k, Y, fx, grad, norm_grad, Delta, done_f, iters, ninner, fx_ref,
         rmax) = st
        upd = done_f == 0.0
        hvp = make_hvp(Y)
        eta, Heta, _stop, nsteps = tcg(hvp, grad, Delta, done_f)
        stop_neg = _stop == float(_NEGATIVE_CURVATURE)
        stop_tr = _stop == float(_EXCEEDED_TR)

        Y_prop = Y + eta
        fx_prop, g_prop, rmax_prop = cost_and_grad(Y_prop)

        rho_reg = jnp.maximum(1.0, jnp.abs(fx)) * eps * rho_regularization
        rhonum = fx - fx_prop + rho_reg
        rhoden = -inner12(grad, eta) - 0.5 * inner12(eta, Heta) + rho_reg
        model_decreased = rhoden >= 0.0
        rho = rhonum / rhoden

        shrink = (rho < 0.25) | (~model_decreased) | jnp.isnan(rho)
        grow = (~shrink) & (rho > 0.75) & (stop_neg | stop_tr)
        Delta_new = jnp.where(
            shrink,
            Delta / 4.0,
            jnp.where(grow, jnp.minimum(2.0 * Delta, Delta_bar), Delta),
        )

        accept = model_decreased & (rho > rho_prime)
        take = upd & accept
        Y_new = jnp.where(take, Y_prop, Y)
        fx_new = jnp.where(take, fx_prop, fx)
        g_new = jnp.where(take, g_prop, grad)
        norm_g_new = jnp.where(
            take, jnp.sqrt(inner12(g_prop, g_prop)), norm_grad
        )
        Delta_out = jnp.where(upd, Delta_new, Delta)

        done_new = jnp.maximum(
            done_f, (upd & (norm_g_new < mingradnorm)).astype(f32)
        )
        rmax_new = rmax
        if res_tol > 0.0:
            # Feasibility-aware stop: the lane's accepted iterate already
            # satisfies every edge to ~res_tol/2 of its length - inside the
            # GN polish basin, so further TR iterations buy nothing.
            rmax_new = jnp.where(take, rmax_prop, rmax)
            done_new = jnp.maximum(
                done_new, (upd & (rmax_new < res_tol)).astype(f32)
            )
        fx_ref_new = fx_ref
        if plateau_every:
            # Cost-plateau stop (see TRParams.plateau_every): checked on the
            # global iteration counter so every live lane compares its cost
            # against the checkpoint from plateau_every iterations ago.
            at_check = (k + 1) % plateau_every == 0
            stalled = (fx_ref - fx_new) <= (
                plateau_rtol * fx_new + plateau_atol
            )
            done_new = jnp.maximum(
                done_new, (upd & stalled & at_check).astype(f32)
            )
            fx_ref_new = jnp.where(at_check, fx_new, fx_ref)
        return (
            k + 1,
            Y_new,
            fx_new,
            g_new,
            norm_g_new,
            Delta_out,
            done_new,
            iters + upd.astype(f32),
            ninner + jnp.where(upd, nsteps, 0.0),
            fx_ref_new,
            rmax_new,
        )

    (k, Y, fx, grad, norm_grad, Delta, done_f, iters, ninner, _fx_ref,
     _rmax) = jax.lax.while_loop(ocond, obody, carry0)

    yout_ref[:] = Y
    stats = jnp.concatenate(
        [fx, norm_grad, iters, ninner, Delta, jnp.zeros((3, TB), f32)],
        axis=0,
    )
    stats_ref[:] = stats


def solve_tr_pallas(
    ep: EdgeProblem,
    Y0,
    dgoal_e,
    *,
    maxiter: int = 3000,
    maxinner: int | None = None,
    mingradnorm: float | None = None,
    kappa: float = 0.1,
    theta: float = 1.0,
    rho_prime: float = 0.1,
    rho_regularization: float = 1e3,
    Delta_bar: float | None = None,
    Delta0: float | None = None,
    mininner: int = 1,
    plateau_every: int = 0,
    plateau_rtol: float = 0.0,
    plateau_atol: float = 0.0,
    res_tol: float = 0.0,
    tile: int | None = None,
    interpret: bool = False,
):
    """Run the full batched TR solve in one Pallas kernel.

    Y0: (B, N, d) float initial points; dgoal_e: (B, E) or (B, Ep) squared
    goal distances on the compiled edge set (EdgeProblem.edge_values).
    Returns dict(Y (B, N, d) f32, cost, gradnorm, iterations, num_inner).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, d = Y0.shape
    Ep = ep.Ep
    Ap = ep.A
    dN = d * N
    if maxinner is None:
        maxinner = dN
    if mingradnorm is None:
        mingradnorm = 2e-6
    if Delta_bar is None:
        Delta_bar = 10.0 + d
    if Delta0 is None:
        Delta0 = Delta_bar / 8.0
    nsp = ep.aPsel.shape[0] if ep.a_nsel else Ap
    if tile is None:
        # Lane-tile sized to the VMEM footprint: per lane the kernel keeps
        # ~(4+2d) edge rows, ~2d anchor rows, ~8 dN state vectors, plus the
        # lane-invariant C/Ct/P blocks; stay within ~1/3 of the ~16 MB
        # scoped-vmem budget to leave room for Mosaic's own spills.
        # Wider tiles amortize per-grid-step loop overhead: 1024 lanes runs
        # the ur10 solve ~19% faster than 128 (round-3 sweep), so start at
        # the largest tile the batch needs (>= _LANE) and shrink to fit.
        per_lane = 4 * ((4 + 2 * d) * Ep + 2 * d * Ap + 8 * dN + 64)
        fixed = 4 * (2 * Ep * N + 2 * nsp * N + 8 * (Ep + Ap))
        budget = 6 * 1024 * 1024
        tile = min(2048, max(_LANE, 1 << (max(B, 1) - 1).bit_length()))
        while tile > 8 and fixed + per_lane * tile > budget:
            tile //= 2
        tile = max(tile, 8)

    Bp = -(-B // tile) * tile
    # (B, N, d) -> (dN, Bp)
    Yl = jnp.transpose(Y0.astype(jnp.float32), (2, 1, 0)).reshape(dN, B)
    act = jnp.ones((1, B), jnp.float32)
    dgf = jnp.zeros((B, Ep), jnp.float32).at[:, : dgoal_e.shape[-1]].set(
        dgoal_e.astype(jnp.float32)
    ).T
    if Bp != B:
        Yl = jnp.pad(Yl, ((0, 0), (0, Bp - B)))
        act = jnp.pad(act, ((0, 0), (0, Bp - B)))
        dgf = jnp.pad(dgf, ((0, 0), (0, Bp - B)))

    kern = partial(
        _tr_kernel,
        N=N, d=d, maxiter=int(maxiter), maxinner=int(maxinner),
        mingradnorm=float(mingradnorm), kappa=float(kappa),
        theta=float(theta), rho_prime=float(rho_prime),
        rho_regularization=float(rho_regularization),
        Delta_bar=float(Delta_bar), Delta0=float(Delta0),
        mininner=int(mininner), has_anchors=bool(Ap),
        a_nsel=int(ep.a_nsel), a_R=int(ep.a_R),
        plateau_every=int(plateau_every), plateau_rtol=float(plateau_rtol),
        plateau_atol=float(plateau_atol), res_tol=float(res_tol),
    )
    grid = (Bp // tile,)
    in_specs = [
        pl.BlockSpec((Ep, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, Ep), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Ep, 8), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Ep, tile), lambda b: (0, b), memory_space=pltpu.VMEM),
    ]
    inputs = [
        jnp.asarray(ep.C, jnp.float32),
        jnp.asarray(ep.C.T, jnp.float32),
        jnp.asarray(np.pad(_pack_params(ep), ((0, 0), (0, 3))), jnp.float32),
        dgf,
    ]
    if Ap:
        apar = np.zeros((Ap, 8), np.float64)
        apar[:, 0] = ep.apsi_L
        apar[:, 1] = ep.apsi_U
        apar[:, 2] = ep.aL_mask
        apar[:, 3] = ep.aU_mask
        apar[:, 4:4 + d] = ep.acenters[:, :d]
        P_sel = ep.aPsel if ep.a_nsel else ep.aP
        in_specs += [
            pl.BlockSpec((nsp, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, nsp), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ap, 8), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ]
        inputs += [
            jnp.asarray(P_sel, jnp.float32),
            jnp.asarray(P_sel.T, jnp.float32),
            jnp.asarray(apar, jnp.float32),
        ]
    in_specs += [
        pl.BlockSpec((dN, tile), lambda b: (0, b), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda b: (0, b), memory_space=pltpu.VMEM),
    ]
    inputs += [Yl, act]
    Yout, stats = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((dN, tile), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((dN, Bp), jnp.float32),
            jax.ShapeDtypeStruct((8, Bp), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    Y = jnp.transpose(Yout.reshape(d, N, Bp)[:, :, :B], (2, 1, 0))
    return {
        "Y": Y,
        "cost": stats[0, :B],
        "gradnorm": stats[1, :B],
        "iterations": stats[2, :B].astype(jnp.int32),
        "num_inner": stats[3, :B].astype(jnp.int32),
    }
