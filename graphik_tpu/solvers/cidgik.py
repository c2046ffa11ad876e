"""CIDGIK: convex-iteration SDP relaxation of the distance program, batched.

Reimplements the reference's CIDGIK path (convex_iteration.py:160-319 +
sdp_snl.py constraint machinery) TPU-first:

* cvxpy/MOSEK interior point -> a batched two-block ADMM over the product
  cone (PSD x box), with the affine projection factored once per instance
  (Cholesky of A A^T) and the cone projection a batched eigh.
* per-clique chordal decomposition -> the dense union clique (the default
  used by solve_with_cidgik, convex_iteration.py:296-300); N ~ 13-20 dense
  PSD matrices are trivial on TPU.
* rank-d forcing via the closed-form Fantope projection C = U_{d:} U_{d:}^T
  (convex_iteration.py:43-53), batched.

Geometry of the lifted variable (sdp_snl.py:107-156):

    Z = [[ I_d , X^T ],      X in R^{n_free x d}: free node positions,
         [ X   , G   ]]      G  = X X^T at a rank-d solution.

Anchored nodes (p0, q0, goal anchors p_ee/q_ee, obstacles) enter the
constraints linearly through their (per-instance) positions; base nodes
x, y are removed entirely (convex_iteration.py:178-180).

Per-instance status codes replace exceptions: 0 = FEASIBLE, 1 = INFEASIBLE
(primal residual did not converge), mirroring utils/constants.py:20-23.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from graphik_tpu.graphs.problem import ProblemStructure
from graphik_tpu.ops.jacobi import jacobi_eigh
from graphik_tpu.ops.linalg import spd_inverse_factor

FEASIBLE = 0
INFEASIBLE = 1


@dataclasses.dataclass(eq=False)
class CidgikCompiled:
    """Static (per robot+environment) CIDGIK problem template.

    Index conventions: SDP nodes are the problem-graph nodes minus x, y.
    `free_idx` / `anchor_idx` map into the ProblemStructure node order.
    Constraint coefficient tables are dense, with per-edge node slots; the
    per-instance anchor positions are gathered inside jit.
    """

    structure: ProblemStructure
    free_idx: np.ndarray  # (n_free,) problem-node indices of free points
    anchor_idx: np.ndarray  # (n_anchor,) problem-node indices of anchors

    # equality edges (free-free): (m_ff, 2) slots into free list; b = d^2
    eq_ff: np.ndarray
    eq_ff_b: np.ndarray
    # equality edges (free-anchor): (m_fa, 2) = (free slot, anchor slot)
    eq_fa: np.ndarray
    eq_fa_d2: np.ndarray  # squared edge distance (static part; goal edges
    # are recomputed per instance from anchor positions)
    eq_fa_dynamic: np.ndarray  # bool: recompute d^2 from instance anchors

    # inequality edges: slots + box bounds (squared)
    in_ff: np.ndarray
    in_ff_lo: np.ndarray
    in_ff_hi: np.ndarray
    in_fa: np.ndarray
    in_fa_lo: np.ndarray
    in_fa_hi: np.ndarray

    @property
    def d(self) -> int:
        return self.structure.dim

    @property
    def n_free(self) -> int:
        return len(self.free_idx)

    @property
    def s(self) -> int:  # lifted matrix size
        return self.d + self.n_free

    @property
    def m_eq(self) -> int:
        d = self.d
        return d * (d + 1) // 2 + len(self.eq_ff) + len(self.eq_fa)

    @property
    def m_in(self) -> int:
        return len(self.in_ff) + len(self.in_fa)


def compile_cidgik(ps: ProblemStructure) -> CidgikCompiled:
    """Host-side constraint assembly (sdp_snl.py:201-398 semantics).

    Supports both 3D revolute and planar problems; the planar variant drops
    the q-auxiliary nodes and anchors the end effector plus its predecessor
    (the reference's planar path, sdp_snl.py:854-871 /
    graph_planar.py:136-145).
    """
    dim = ps.dim

    # SDP nodes: everything except x, y (convex_iteration.py:178-180)
    sdp_nodes = [i for i in range(ps.N) if i not in (ps.idx_x, ps.idx_y)]

    # anchors: statically positioned nodes (p0, q0, obstacles) + goal nodes
    anchor = set()
    for i in sdp_nodes:
        if ps.anchor_mask[i]:
            anchor.add(i)
    free = [i for i in sdp_nodes if i not in anchor]
    anchor = sorted(anchor)
    free_slot = {node: k for k, node in enumerate(free)}
    anchor_slot = {node: k for k, node in enumerate(anchor)}

    goal_anchor = set()
    for ee in ps.template.ee:
        goal_anchor.add(ps.idx_p(int(ee)))
        if dim == 3:
            goal_anchor.add(ps.idx_q(int(ee)))
        else:
            goal_anchor.add(ps.idx_p(int(ps.template.parents[int(ee)])))

    eq_ff, eq_ff_b = [], []
    eq_fa, eq_fa_d2, eq_fa_dyn = [], [], []
    in_ff, in_ff_lo, in_ff_hi = [], [], []
    in_fa, in_fa_lo, in_fa_hi = [], [], []

    for a in range(ps.N):
        for b in range(a + 1, ps.N):
            if a not in free_slot and a not in anchor_slot:
                continue
            if b not in free_slot and b not in anchor_slot:
                continue
            both_anchor = a in anchor_slot and b in anchor_slot
            if both_anchor:
                continue  # constant constraints carry no information
            if ps.omega_struct[a, b]:
                d2 = float(ps.D_struct[a, b])
                if a in free_slot and b in free_slot:
                    eq_ff.append((free_slot[a], free_slot[b]))
                    eq_ff_b.append(d2)
                else:
                    f, anc = (a, b) if a in free_slot else (b, a)
                    dynamic = anc in goal_anchor
                    eq_fa.append((free_slot[f], anchor_slot[anc]))
                    eq_fa_d2.append(d2)
                    eq_fa_dyn.append(dynamic)
            elif ps.bounded_mask[a, b]:
                lo = float(ps.check_L[a, b]) ** 2
                hi = float(ps.check_U[a, b]) ** 2
                if a in free_slot and b in free_slot:
                    in_ff.append((free_slot[a], free_slot[b]))
                    in_ff_lo.append(lo)
                    in_ff_hi.append(hi)
                else:
                    f, anc = (a, b) if a in free_slot else (b, a)
                    in_fa.append((free_slot[f], anchor_slot[anc]))
                    in_fa_lo.append(lo)
                    in_fa_hi.append(hi)

    def arr(x, dtype=float):
        return np.asarray(x, dtype=dtype).reshape(len(x), -1) if len(x) else np.zeros((0, 2), dtype=dtype)

    return CidgikCompiled(
        structure=ps,
        free_idx=np.asarray(free, dtype=np.int64),
        anchor_idx=np.asarray(anchor, dtype=np.int64),
        eq_ff=arr(eq_ff, np.int64),
        eq_ff_b=np.asarray(eq_ff_b, dtype=float),
        eq_fa=arr(eq_fa, np.int64),
        eq_fa_d2=np.asarray(eq_fa_d2, dtype=float),
        eq_fa_dynamic=np.asarray(eq_fa_dyn, dtype=bool),
        in_ff=arr(in_ff, np.int64),
        in_ff_lo=np.asarray(in_ff_lo, dtype=float),
        in_ff_hi=np.asarray(in_ff_hi, dtype=float),
        in_fa=arr(in_fa, np.int64),
        in_fa_lo=np.asarray(in_fa_lo, dtype=float),
        in_fa_hi=np.asarray(in_fa_hi, dtype=float),
    )


# ---------------------------------------------------------------------------
# Constraint operator (dense batched linear algebra, no explicit A matrices)
# ---------------------------------------------------------------------------

def _constraint_matrices(comp: CidgikCompiled, anchors_pos, dtype):
    """Materialize the (m, s, s) symmetric constraint tensor + rhs/boxes.

    anchors_pos: (n_anchor, d) per-instance anchor positions.
    Returns (A_eq (m_eq,s,s), b_eq (m_eq,), A_in (m_in,s,s), lo, hi).
    """
    d = comp.d
    s = comp.s
    nf = comp.n_free

    mats = []
    rhs = []

    # identity block: Z[i, j] = delta_ij for i <= j < d (sdp_snl.py:140-156)
    for i in range(d):
        for j in range(i, d):
            A = np.zeros((s, s))
            A[i, j] += 0.5
            A[j, i] += 0.5
            mats.append(A)
            rhs.append(1.0 if i == j else 0.0)
    A_id = jnp.asarray(np.stack(mats), dtype=dtype)
    b_id = jnp.asarray(np.asarray(rhs), dtype=dtype)

    def ff_mats(pairs):
        out = np.zeros((len(pairs), s, s))
        for k, (u, v) in enumerate(pairs):
            out[k, d + u, d + u] = 1.0
            out[k, d + v, d + v] = 1.0
            out[k, d + u, d + v] = -1.0
            out[k, d + v, d + u] = -1.0
        return out

    def fa_mats(pairs, anchors_pos):
        # G_uu - 2 a^T X_u  (the ||a||^2 constant moves to the rhs)
        m = len(pairs)
        out = jnp.zeros((m, s, s), dtype=dtype)
        if m == 0:
            return out
        u = jnp.asarray(pairs[:, 0])
        asl = jnp.asarray(pairs[:, 1])
        a_pos = anchors_pos[asl]  # (m, d)
        out = out.at[jnp.arange(m), d + u, d + u].set(1.0)
        out = out.at[jnp.arange(m)[:, None], d + u[:, None], jnp.arange(d)[None, :]].set(
            -a_pos
        )
        out = out.at[jnp.arange(m)[:, None], jnp.arange(d)[None, :], d + u[:, None]].set(
            -a_pos
        )
        return out

    A_eq_parts = [A_id]
    b_eq_parts = [b_id]
    if len(comp.eq_ff):
        A_eq_parts.append(jnp.asarray(ff_mats(comp.eq_ff), dtype=dtype))
        b_eq_parts.append(jnp.asarray(comp.eq_ff_b, dtype=dtype))
    if len(comp.eq_fa):
        A_fa = fa_mats(comp.eq_fa, anchors_pos)
        A_eq_parts.append(A_fa)
        asl = jnp.asarray(comp.eq_fa[:, 1])
        a_norm2 = jnp.sum(anchors_pos[asl] ** 2, axis=-1)
        d2_static = jnp.asarray(comp.eq_fa_d2, dtype=dtype)
        # dynamic goal edges: recompute the edge length from instance anchors?
        # Structure edges touching goal anchors keep their static rigid
        # length (the goal only moves the anchor), so d2_static is correct
        # for all of them; b = d^2 - ||a||^2.
        b_eq_parts.append(d2_static - a_norm2)
    A_eq = jnp.concatenate(A_eq_parts, axis=0)
    b_eq = jnp.concatenate(b_eq_parts, axis=0)

    A_in_parts = []
    lo_parts = []
    hi_parts = []
    if len(comp.in_ff):
        A_in_parts.append(jnp.asarray(ff_mats(comp.in_ff), dtype=dtype))
        lo_parts.append(jnp.asarray(comp.in_ff_lo, dtype=dtype))
        hi_parts.append(jnp.asarray(comp.in_ff_hi, dtype=dtype))
    if len(comp.in_fa):
        A_in_parts.append(fa_mats(comp.in_fa, anchors_pos))
        asl = jnp.asarray(comp.in_fa[:, 1])
        a_norm2 = jnp.sum(anchors_pos[asl] ** 2, axis=-1)
        lo_parts.append(jnp.asarray(comp.in_fa_lo, dtype=dtype) - a_norm2)
        hi_parts.append(jnp.asarray(comp.in_fa_hi, dtype=dtype) - a_norm2)
    if A_in_parts:
        A_in = jnp.concatenate(A_in_parts, axis=0)
        lo = jnp.concatenate(lo_parts, axis=0)
        hi = jnp.concatenate(hi_parts, axis=0)
    else:
        A_in = jnp.zeros((0, s, s), dtype=dtype)
        lo = jnp.zeros((0,), dtype=dtype)
        hi = jnp.zeros((0,), dtype=dtype)

    # SCS-style row normalization: unit-Frobenius constraint matrices keep
    # the ADMM operator well conditioned across edge length scales.
    def rownorm(A):
        return jnp.sqrt(jnp.maximum(jnp.sum(A * A, axis=(-2, -1)), 1e-12))

    n_eq = rownorm(A_eq)
    A_eq = A_eq / n_eq[:, None, None]
    b_eq = b_eq / n_eq
    if A_in.shape[0]:
        n_in = rownorm(A_in)
        A_in = A_in / n_in[:, None, None]
        lo = lo / n_in
        hi = hi / n_in
    return A_eq, b_eq, A_in, lo, hi


# ---------------------------------------------------------------------------
# Batched conic ADMM:  min <C,Z>  s.t. A_eq(Z)=b, lo <= A_in(Z) <= hi, Z >= 0
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CidgikParams:
    max_outer: int = 10  # convex-iteration budget (convex_iteration.py:164)
    admm_iters: int = 2000  # per SDP solve (cap; stops early on admm_tol)
    admm_tol: float = 1e-7  # primal-dual residual target per solve
    relax: float = 1.6  # ADMM over-relaxation
    rho: float = 1.0  # ADMM penalty
    abs_tol: float = 1e-6  # eig-sum/cost tolerances (convex_iteration.py:169-171)
    rel_tol: float = 1e-3
    feas_tol: float = 1e-4  # primal residual -> FEASIBLE/INFEASIBLE
    # Eigendecomposition backend for the cone/Fantope projections:
    # fixed-sweep Jacobi (ops/jacobi.py) keeps the compiled program tiny -
    # XLA's iterative eigh inside while x scan x vmap takes >25 min to
    # compile on TPU. 0 = use jnp.linalg.eigh.
    eigh_sweeps: int = 8
    # PSD cone projection backend for the per-ADMM-iteration projection:
    # >0 switches from the Jacobi eigendecomposition (~120 sequential
    # scatter-heavy rotation rounds per call) to that many Newton-Schulz
    # matrix-sign iterations (ops/linalg.psd_project_ns) - pure batched
    # (s, s) matmuls on the MXU. The Fantope projection (once per OUTER
    # round) needs actual eigenvectors and always uses eigh.
    cone_ns_iters: int = 0
    # Iterative-refinement steps for the affine-projection Cholesky solve.
    # In float32 the ~90x90 constraint Gram is ill-conditioned enough that
    # the raw solve biases the ADMM fixed point by ~cm; one refinement step
    # recovers near-f64 solve quality at ~2x the solve cost.
    refine_steps: int = 1
    # Residual-balancing rho adaptation (Boyd et al. sec 3.4.1): when the
    # primal residual exceeds adapt_mu x the dual residual, multiply rho by
    # adapt_tau and rescale the scaled duals (and vice versa). 0 disables
    # (default: on this problem family unbounded growth of rho drowns the
    # linear rank-forcing cost C/rho and stalls the convex iteration, so
    # adaptation is opt-in and rho is clipped to [adapt_lo, adapt_hi]).
    adapt_every: int = 0
    adapt_mu: float = 10.0
    adapt_tau: float = 2.0
    adapt_lo: float = 0.3
    adapt_hi: float = 3.0


def _solve_sdp_admm(A_eq, b_eq, A_in, lo, hi, C, Z0, s0, u0, params):
    """One linear-cost SDP solve via two-block ADMM (single instance).

    Splitting: P = (Z, t) with the affine set {A_eq(Z)=b, A_in(Z)-t=0} and
    the cone set PSD x [lo, hi]. The affine projection uses a Cholesky of
    the constraint Gram matrix, computed once per call.
    """
    m_eq = A_eq.shape[0]
    m_in = A_in.shape[0]
    s = A_eq.shape[-1]
    rho = params.rho

    # Gram of the combined operator Abar(Z, t) = [A_eq(Z); A_in(Z) - t]
    A_all = jnp.concatenate([A_eq, A_in], axis=0)  # (m, s, s)
    Gmm = jnp.einsum("mij,nij->mn", A_all, A_all)
    if m_in:
        Gmm = Gmm.at[m_eq:, m_eq:].add(jnp.eye(m_in, dtype=Gmm.dtype))
    Gmm = Gmm + 1e-9 * jnp.trace(Gmm) / Gmm.shape[0] * jnp.eye(
        Gmm.shape[0], dtype=Gmm.dtype
    )
    # bf16-safe inverse factor: lax.linalg.cholesky lowers to XLA's
    # internal decomposition whose matmuls run at bf16 on TPU f32,
    # corrupting the affine projection; spd_inverse_factor uses explicit
    # HIGHEST-precision dots (ops/linalg.py).
    Linv = spd_inverse_factor(Gmm)
    hp = jax.lax.Precision.HIGHEST

    def solve_gram(r):
        def apply_inv(v):
            return jnp.matmul(
                jnp.swapaxes(Linv, -1, -2),
                jnp.matmul(Linv, v, precision=hp), precision=hp,
            )

        y = apply_inv(r)
        for _ in range(params.refine_steps):
            y = y + apply_inv(r - jnp.matmul(Gmm, y, precision=hp))
        return y

    def affine_project(Z, t):
        r = jnp.concatenate(
            [jnp.einsum("mij,ij->m", A_eq, Z) - b_eq,
             jnp.einsum("mij,ij->m", A_in, Z) - t]
            if m_in
            else [jnp.einsum("mij,ij->m", A_eq, Z) - b_eq]
        )
        y = solve_gram(r)
        Z_new = Z - jnp.einsum("m,mij->ij", y, A_all)
        t_new = t + y[m_eq:] if m_in else t
        return Z_new, t_new

    def cone_project(W, t):
        if params.cone_ns_iters:
            from graphik_tpu.ops.linalg import psd_project_ns

            Wp = psd_project_ns(W, iters=params.cone_ns_iters)
        elif params.eigh_sweeps:
            lam, Q = jacobi_eigh(W, sweeps=params.eigh_sweeps)
            lam = jnp.maximum(lam, 0.0)
            Wp = (Q * lam[None, :]) @ Q.T
        else:
            lam, Q = jnp.linalg.eigh(W)
            lam = jnp.maximum(lam, 0.0)
            Wp = (Q * lam[None, :]) @ Q.T
        tp = jnp.clip(t, lo, hi) if m_in else t
        return Wp, tp

    alpha = params.relax  # over-relaxation
    dt = Z0.dtype

    def cond(carry):
        Z, t, Uz, ut, rho_c, k, res = carry
        return (res > params.admm_tol) & (k < params.admm_iters)

    def body(carry):
        Z, t, Uz, ut, rho_c, k, _ = carry
        # prox of <C,Z> + affine indicator at (W - U): shift by C/rho, project
        Z1, t1 = affine_project(Z - Uz - C / rho_c, t - ut)
        # over-relaxed cone projection
        Zr = alpha * Z1 + (1.0 - alpha) * Z
        tr = alpha * t1 + (1.0 - alpha) * t
        Z2, t2 = cone_project(Zr + Uz, tr + ut)
        Uz_new = Uz + Zr - Z2
        ut_new = ut + tr - t2
        pri = jnp.sqrt(
            jnp.sum((Z1 - Z2) ** 2) + (jnp.sum((t1 - t2) ** 2) if m_in else 0.0)
        )
        dua = rho_c * jnp.sqrt(
            jnp.sum((Z2 - Z) ** 2) + (jnp.sum((t2 - t) ** 2) if m_in else 0.0)
        )
        if params.adapt_every:
            # residual balancing (Boyd et al. 3.4.1); scaled duals rescale
            # with 1/rho so the unscaled dual variable is continuous.
            up = pri > params.adapt_mu * dua
            down = dua > params.adapt_mu * pri
            fire = (k % params.adapt_every == params.adapt_every - 1) & (
                up | down
            )
            scale = jnp.where(up, params.adapt_tau,
                              1.0 / params.adapt_tau).astype(dt)
            # Clip only when an adaptation actually fires: a user-supplied
            # rho outside [adapt_lo, adapt_hi] must not be silently snapped
            # into the band on iteration 1.
            rho_new = jnp.where(
                fire,
                jnp.clip(rho_c * scale, params.adapt_lo, params.adapt_hi),
                rho_c,
            )
            adj = rho_c / rho_new
            Uz_new = Uz_new * adj
            ut_new = ut_new * adj
        else:
            rho_new = rho_c
        return (Z2, t2, Uz_new, ut_new, rho_new, k + 1, pri)

    init = (Z0, s0, u0[0], u0[1], jnp.asarray(rho, dt),
            jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dt))
    Z, t, Uz, ut, _, _, _ = jax.lax.while_loop(cond, body, init)

    # primal feasibility of the returned cone-feasible iterate
    r_eq = jnp.einsum("mij,ij->m", A_eq, Z) - b_eq
    feas = jnp.max(jnp.abs(r_eq)) if m_eq else jnp.zeros((), Z.dtype)
    if m_in:
        v = jnp.einsum("mij,ij->m", A_in, Z)
        feas = jnp.maximum(
            feas, jnp.max(jnp.maximum(lo - v, 0.0) + jnp.maximum(v - hi, 0.0))
        )
    return Z, t, (Uz, ut), feas


def _fantope(Z, d, eigh_sweeps: int = 8):
    """Closed-form Fantope projection C = U_{d:} U_{d:}^T
    (convex_iteration.py:43-53) and the excess-rank eigenvalue sum."""
    if eigh_sweeps:
        lam, Q = jacobi_eigh(Z, sweeps=eigh_sweeps)  # ascending
    else:
        lam, Q = jnp.linalg.eigh(Z)  # ascending
    n_small = Z.shape[-1] - d
    U = Q[..., :n_small]  # all but the top-d eigenvectors
    C = U @ jnp.swapaxes(U, -1, -2)
    eig_sum = jnp.sum(lam[..., :n_small], axis=-1)
    return C, eig_sum


def nearest_point_cost_matrix(comp: CidgikCompiled, targets, dtype=None):
    """Linear cost C with tr(C Z) = sum_u (G_uu - 2 p_u^T x_u).

    Up to the constant sum ||p_u||^2 this is the nearest-point objective
    sum_u ||x_u - p_u||^2 (reference sdp_snl.py:417-445 cost map).
    targets: (..., n_free, d).
    """
    targets = jnp.asarray(targets, dtype=dtype)
    dt = targets.dtype
    d = comp.d
    s = comp.s
    nf = comp.n_free
    batch = targets.shape[:-2]
    C = jnp.zeros(batch + (s, s), dt)
    C = C.at[..., d:, d:].add(jnp.eye(nf, dtype=dt))
    C = C.at[..., d:, :d].add(-targets)
    C = C.at[..., :d, d:].add(-jnp.swapaxes(targets, -1, -2))
    return C


def solve_nearest_point_sdp(
    comp: CidgikCompiled,
    anchors_pos,
    targets,
    params: CidgikParams = CidgikParams(),
    ranges: bool = False,
    dtype=None,
):
    """Nearest-point SDP: project target points onto the constraint set.

    The reference's second SDP entry point (`solve_nearest_point_sdp`,
    sdp_snl.py:810-851): a single linear-cost SDP (no convex iteration)
    minimizing sum_u ||x_u - p_u||^2 subject to the distance equalities
    (and, with ranges=True, the bound inequalities).

    anchors_pos: (..., n_anchor, d); targets: (..., n_free, d); leading
    dims batch. Returns dict(points (..., n_free, d), Z, feas).
    """
    anchors_pos = jnp.asarray(anchors_pos, dtype=dtype)
    dt = anchors_pos.dtype
    targets = jnp.asarray(targets, dtype=dt)
    d = comp.d
    s = comp.s

    def single(anc_pos, tgt):
        A_eq, b_eq, A_in, lo, hi = _constraint_matrices(comp, anc_pos, dt)
        if not ranges:
            A_in = A_in[:0]
            lo = lo[:0]
            hi = hi[:0]
        C = nearest_point_cost_matrix(comp, tgt)
        Z = jnp.zeros((s, s), dtype=dt).at[:d, :d].set(jnp.eye(d, dtype=dt))
        Z = Z.at[d:, :d].set(tgt)
        Z = Z.at[:d, d:].set(tgt.T)
        Z = Z.at[d:, d:].set(tgt @ tgt.T)
        t = jnp.clip(
            jnp.einsum("mij,ij->m", A_in, Z), lo, hi
        ) if A_in.shape[0] else jnp.zeros((0,), dt)
        U = (jnp.zeros((s, s), dtype=dt), jnp.zeros(A_in.shape[0], dtype=dt))
        Z_out, _, _, feas = _solve_sdp_admm(
            A_eq, b_eq, A_in, lo, hi, C, Z, t, U, params
        )
        return Z_out, feas

    fn = single
    batch = anchors_pos.shape[:-2]
    for _ in range(len(batch)):
        fn = jax.vmap(fn)
    with jax.default_matmul_precision("highest"):
        Z, feas = fn(anchors_pos, targets)
    return {"points": Z[..., d:, :d], "Z": Z, "feas": feas}


def solve_cidgik(
    comp: CidgikCompiled,
    T_goal,
    params: CidgikParams = CidgikParams(),
    dtype=None,
):
    """Batched CIDGIK solve (solve_with_cidgik, convex_iteration.py:279-319).

    T_goal: (..., 4, 4) or (..., n_ee, 4, 4); leading dims batch.
    Returns dict: q, points (all problem nodes), status, eig_sum, feas.
    """
    ps = comp.structure
    pos_all = ps.goal_positions(T_goal, dtype=dtype)  # (..., N, dim)
    dt = pos_all.dtype
    d = comp.d
    s = comp.s

    anchors_pos = pos_all[..., jnp.asarray(comp.anchor_idx), :]

    def single(anc_pos, pos_nodes):
        A_eq, b_eq, A_in, lo, hi = _constraint_matrices(comp, anc_pos, dt)

        Z = jnp.zeros((s, s), dtype=dt).at[:d, :d].set(jnp.eye(d, dtype=dt))
        t = jnp.clip(jnp.zeros(A_in.shape[0], dtype=dt), lo, hi)
        U = (jnp.zeros((s, s), dtype=dt), jnp.zeros(A_in.shape[0], dtype=dt))
        C = jnp.eye(s, dtype=dt)  # identity init (convex_iteration.py:215)

        def outer(carry, _):
            Z, t, U, C, last_cost, done, feas_prev, eig_prev = carry
            Z_new, t_new, U_new, feas = _solve_sdp_admm(
                A_eq, b_eq, A_in, lo, hi, C, Z, t, U, params
            )
            C_new, eig_sum = _fantope(Z_new, d, params.eigh_sweeps)
            cost = jnp.sum(C * Z_new)
            change = jnp.abs(last_cost - cost)
            rel = change / jnp.maximum(jnp.abs(last_cost), 1e-30)
            new_done = done | (
                (change <= params.abs_tol)
                | (cost <= params.abs_tol)
                | (rel < params.rel_tol)
            )
            # frozen lanes keep state
            keep = lambda old, new: jnp.where(done, old, new)
            return (
                keep(Z, Z_new),
                keep(t, t_new),
                jax.tree.map(keep, U, U_new),
                keep(C, C_new),
                keep(last_cost, cost),
                new_done,
                keep(feas_prev, feas),
                keep(eig_prev, eig_sum),
            ), None

        init = (
            Z, t, U, C,
            jnp.asarray(1e6, dt),
            jnp.zeros((), bool),
            jnp.asarray(jnp.inf, dt),
            jnp.asarray(jnp.inf, dt),
        )
        (Z, t, U, C, cost, done, feas, eig_sum), _ = jax.lax.scan(
            outer, init, None, length=params.max_outer
        )

        X = Z[d:, :d]  # free point positions (global frame; anchors fix gauge)
        points = pos_nodes
        points = points.at[jnp.asarray(comp.free_idx), :].set(X)
        status = jnp.where(feas <= params.feas_tol, FEASIBLE, INFEASIBLE)
        return points, status, eig_sum, feas

    fn = single
    batch = pos_all.shape[:-2]
    for _ in range(len(batch)):
        fn = jax.vmap(fn)
    with jax.default_matmul_precision("highest"):
        points, status, eig_sum, feas = fn(anchors_pos, pos_all)
        q = ps.joint_variables(points, T_goal)
    return {
        "q": q,
        "points": points,
        "status": status,
        "eig_sum": eig_sum,
        "feas": feas,
    }
