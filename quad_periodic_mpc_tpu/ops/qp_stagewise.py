"""Stage-wise (sparse) MPC solver: Riccati-ADMM for long horizons.

Rebuilds the role of SparseCMPC (src/common/SparseCMPC/SparseCMPC.cpp):
the reference hands the non-condensed stage-wise QP (per-step dynamics
equality triples, z-force bounds, friction pyramids,
SparseCMPC.cpp:191-336) to OSQP's generic sparse ADMM.  The TPU-native
formulation specializes the linear algebra instead: the ADMM x-update is
an equality-constrained tracking LQR.  Production path (solve):
lqr_factorize computes the iteration-invariant value quadratics and
gains ONCE per solve via an associative-scan Riccati (parallel in time,
O(log h) depth — the "sequence parallel" axis of SURVEY.md section 5);
each ADMM iteration then costs two affine associative scans
(lqr_apply).  A sequential reference implementation (lqr_solve) is kept
for testing.  Beyond speed, this formulation is the long-horizon path
full stop: the condensed Hessian's f32 dynamic range collapses past
h ~ 20 (the reference hard-caps h = 19, SolverMPC.cpp:113), while the
stage-wise quadratics stay O(1) in h.

Splitting (same cone as the condensed path, ops/constraints.py):

    min  sum_k 1/2 (x_k - xref_k)^T Qs (x_k - xref_k) + 1/2 u_k^T Rs u_k
    s.t. x_{k+1} = Ad x_k + Bd u_k + c_k,   l <= F u_k <= u.

With Qs = 2 diag(w13), Rs = 2 alpha I this objective equals the
condensed QP's (SolverMPC.cpp:806-814) exactly, so both solvers agree at
the optimum (tested).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import ADMMConfig
from quad_periodic_mpc_tpu.ops import constraints as con

NX = 13
NU = 12

# NS rounds for the factorization's inner inverses (the combine's
# (I + C J)^{-1} and Quu^{-1}).  Spectral budget: the spectrum lies in
# [1, L]; the smallest eigenvalue's seed residual is 1 - 1/L and NS
# squares it per round, so reaching 1e-6 needs ~ceil(log2(L ln 1e6)).
# L = 1 + ||C J|| grows with the SUFFIX LENGTH the combine has
# accumulated (C_ij sums ~h/2 steps of B R_eff^{-1} B', each ~1e3
# against Q ~ 1e2): L ~ 1e3 at h = 16 -> 16 rounds suffice, but h = 32
# and h = 64 measured primal 9.0e-3 / 8.4e-3 (above the 6e-3 gate) at
# a flat 16 — the budget must scale with log2(h/16).  The factorization
# is the launch/HBM-bound stagewise cost on TPU, so rounds are paid in
# wall-clock: ns_combine_iters(h) spends the budget each horizon needs
# (h=16: 16, h=32: 18, h=64: 20; the pre-round-4 flat 24 overpaid the
# short horizons while h>=32 was never audited).
NS_COMBINE_ITERS = 16


def ns_combine_iters(h: int) -> int:
    """Horizon-scaled NS round budget for the factorization inverses."""
    import math

    return NS_COMBINE_ITERS + 2 * max(
        0, math.ceil(math.log2(max(h, 16) / 16))
    )


class StagewiseProblem(NamedTuple):
    Ad: jnp.ndarray      # (..., 13, 13) discrete dynamics (time-invariant)
    Bd: jnp.ndarray      # (..., 13, 12)
    c: jnp.ndarray       # (..., 13) per-step affine term (Qd @ f_est)
    x0: jnp.ndarray      # (..., 13)
    x_ref: jnp.ndarray   # (..., h, 13)
    Q: jnp.ndarray       # (13,) stage state cost diagonal
    R: jnp.ndarray       # (12,) input cost diagonal
    F: jnp.ndarray       # (5, 3) pyramid block
    l: jnp.ndarray       # (..., h, 20)
    u: jnp.ndarray       # (..., h, 20)


def lqr_solve(
    prob: StagewiseProblem,
    R_eff_diag_extra: jnp.ndarray,      # (3, 3) G = rho F^T F block add-on
    r_lin: jnp.ndarray,                 # (..., h, 12) linear u-term
) -> jnp.ndarray:
    """Tracking LQR with affine dynamics: returns U (..., h, 12).

    Minimizes sum_k 1/2 dx_k^T Q dx_k + 1/2 u_k^T R_eff u_k - r_k^T u_k
    with dx = x - xref, x_{k+1} = Ad x_k + Bd u_k + c.  Backward Riccati
    (lax.scan reverse) + forward rollout.
    """
    h = prob.x_ref.shape[-2]
    dtype = prob.x0.dtype
    Qm = jnp.diag(prob.Q).astype(dtype)
    R_eff = jnp.diag(prob.R).astype(dtype) + jnp.kron(
        jnp.eye(4, dtype=dtype), R_eff_diag_extra
    )
    Ad, Bd = prob.Ad, prob.Bd
    AdT = jnp.swapaxes(Ad, -1, -2)
    BdT = jnp.swapaxes(Bd, -1, -2)

    # The condensed QP penalizes the POST-step states x_1..x_h against
    # xref_0..xref_{h-1} (A_qp row r is Adt^{r+1}, SolverMPC.cpp:128).
    # Riccati form: terminal cost (Q, -Q xref_{h-1}) on x_h; stage k >= 1
    # carries state cost (Q, -Q xref_{k-1}); stage 0 has none (x_0 fixed).
    q_lin = -jnp.einsum("ij,...hj->...hi", Qm, prob.x_ref)

    def backward(carry, inp):
        P, p = carry
        q_k, r_k, has_state_cost = inp
        # Quu = R + B'PB, Qux = B'PA, qu = B'(P c + p) - r
        Quu = R_eff + BdT @ P @ Bd
        Qux = BdT @ P @ Ad
        qu = jnp.einsum(
            "...ij,...j->...i", BdT,
            jnp.einsum("...ij,...j->...i", P, prob.c) + p,
        ) - r_k
        K = jnp.linalg.solve(Quu, Qux)
        kff = jnp.linalg.solve(Quu, qu[..., None])[..., 0]
        # value recursion: P' = Qk + A'PA - Qux' K; p' = qk + A'(Pc+p) - Qux' k
        Qk = has_state_cost * Qm
        P_new = Qk + AdT @ P @ Ad - jnp.swapaxes(Qux, -1, -2) @ K
        p_new = (
            has_state_cost * q_k
            + jnp.einsum("...ij,...j->...i", AdT,
                         jnp.einsum("...ij,...j->...i", P, prob.c) + p)
            - jnp.einsum("...ji,...j->...i", Qux, kff)
        )
        P_new = (P_new + jnp.swapaxes(P_new, -1, -2)) / 2.0
        return (P_new, p_new), (K, kff)

    batch = prob.x0.shape[:-1]
    P_T = jnp.broadcast_to(Qm, batch + (NX, NX))            # terminal: x_h
    p_T = jnp.broadcast_to(q_lin[..., h - 1, :], batch + (NX,))

    # stage k=1..h-1 state cost uses xref_{k-1}; stage 0 none
    q_stage = jnp.concatenate(
        [jnp.zeros_like(q_lin[..., :1, :]), q_lin[..., : h - 1, :]], axis=-2
    )
    mask = jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.ones((h - 1,), dtype)]
    )
    q_t = jnp.moveaxis(q_stage, -2, 0)    # (h, ..., 13)
    r_t = jnp.moveaxis(r_lin, -2, 0)      # (h, ..., 12)
    (_, _), (K_t, k_t) = jax.lax.scan(
        backward, (P_T, p_T), (q_t, r_t, mask), reverse=True
    )

    def forward(x, inp):
        K, kff = inp
        u = -jnp.einsum("...ij,...j->...i", K, x) - kff
        x_next = (
            jnp.einsum("...ij,...j->...i", Ad, x)
            + jnp.einsum("...ij,...j->...i", Bd, u)
            + prob.c
        )
        return x_next, u

    _, U_t = jax.lax.scan(forward, prob.x0, (K_t, k_t))
    return jnp.moveaxis(U_t, 0, -2)       # (..., h, 12)


class LQRGains(NamedTuple):
    """Iteration-invariant LQR factorization (see lqr_factorize)."""

    K: jnp.ndarray       # (..., h, 12, 13) feedback gains
    Minv: jnp.ndarray    # (..., h, 12, 12) (R_eff + B'P_{k+1}B)^{-1}
    G: jnp.ndarray       # (..., h, 13, 12) Qux' M^{-1}
    Ft: jnp.ndarray      # (..., h, 13, 13) backward linear map A' - G B'
    Acl: jnp.ndarray     # (..., h, 13, 13) closed-loop A - B K
    Pc: jnp.ndarray      # (..., h, 13) P_{k+1} @ c
    q_stage: jnp.ndarray # (..., h, 13) stage linear cost (masked -Q xref)
    p_T: jnp.ndarray     # (..., 13) terminal linear cost


def _ns_posspec_inverse(
    M: jnp.ndarray, iters: int = NS_COMBINE_ITERS
) -> jnp.ndarray:
    """Newton-Schulz inverse for a (possibly nonsymmetric) matrix whose
    spectrum is real and >= 1 (here M = I + C J with C, J PSD: similar
    to I + C^{1/2} J C^{1/2}).  The scalar seed X0 = I / ||M||_inf makes
    every iterate a polynomial in M, so convergence is the scalar
    recurrence r <- r^2 on each eigenvalue: iters ~ log2(cond) + 6.
    HIGH (3-pass bf16 ~ f32) matmul precision: the bf16 default's
    residual floor cond * 2^-8 diverges at the cond ~ 1e3-1e4 these
    control-penalty systems reach (R_eff ~ 1e-4 makes C ~ 1e3).
    """
    hi3 = jax.lax.Precision.HIGH
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)
    norm = jnp.max(jnp.sum(jnp.abs(M), axis=-1), axis=-1)
    X = jnp.broadcast_to(eye, M.shape) / norm[..., None, None]

    def body(_, X):
        MX = jnp.einsum("...ij,...jk->...ik", M, X, precision=hi3)
        return jnp.einsum(
            "...ij,...jk->...ik", X, 2.0 * eye - MX, precision=hi3
        )

    return jax.lax.fori_loop(0, iters, body, X)


def lqr_factorize(
    prob: StagewiseProblem,
    R_eff_diag_extra: jnp.ndarray,
) -> LQRGains:
    """Associative-scan Riccati: the parallel-in-time factorization.

    The ADMM x-update's LQR has iteration-INVARIANT quadratics — only
    the linear term r changes per iteration — so the value quadratics
    P_k and all gain matrices are computed ONCE per solve, in O(log h)
    depth, via jax.lax.associative_scan over Sarkka-style conditional
    value elements (A, C, J) with combine

        D    = (I + C_i J_j)^{-1}
        A_ij = A_j D A_i
        C_ij = A_j D C_i A_j' + C_j
        J_ij = A_i' D' J_j A_i + J_i

    (Temporal Parallelization of LQR; D' = (I + J_j C_i)^{-1} because
    C, J are symmetric).  This replaces the sequential backward scan
    whose per-stage jnp.linalg.solve (tiny batched LU) made the TPU
    path launch/LU-bound (~1.8 ms PER STAGE-STEP measured).  The
    reference's analog is OSQP's one-time sparse KKT factorization
    reused across iterations (SparseCMPC.cpp:27-137 setup vs solve).
    """
    h = prob.x_ref.shape[-2]
    dtype = prob.x0.dtype
    batch = prob.x0.shape[:-1]
    hi3 = jax.lax.Precision.HIGH
    mm = lambda a, b: jnp.einsum("...ij,...jk->...ik", a, b, precision=hi3)
    mv = lambda a, b: jnp.einsum("...ij,...j->...i", a, b, precision=hi3)
    tr = lambda a: jnp.swapaxes(a, -1, -2)

    Qm = jnp.diag(prob.Q).astype(dtype)
    R_eff = jnp.diag(prob.R).astype(dtype) + jnp.kron(
        jnp.eye(4, dtype=dtype), R_eff_diag_extra.astype(dtype)
    )
    from quad_periodic_mpc_tpu.ops import linalg

    ns_it = ns_combine_iters(h)

    R_inv = linalg.ns_inverse(
        jnp.broadcast_to(R_eff, batch + (NU, NU)), iters=30,
        precision=jax.lax.Precision.HIGHEST,
    )
    Ad = jnp.broadcast_to(prob.Ad, batch + (NX, NX))
    Bd = jnp.broadcast_to(prob.Bd, batch + (NX, NU))
    C_step = mm(mm(Bd, R_inv), tr(Bd))                       # (..., 13, 13)

    # stage state costs: none at x_0, Q at x_1..x_h against xref_0..h-1
    # (condensation convention, lqr_solve above / SolverMPC.cpp:128)
    q_lin = -jnp.einsum("ij,...hj->...hi", Qm, prob.x_ref)
    mask = jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.ones((h - 1,), dtype)]
    )

    # elements k = 0..h-1 (transition + source-state cost) and k = h
    # (terminal cost only: A = C = 0)
    def bcast_h(x, extra):
        return jnp.broadcast_to(
            x[..., None, :, :], batch + (h,) + extra
        )

    A_el = jnp.concatenate(
        [bcast_h(Ad, (NX, NX)), jnp.zeros(batch + (1, NX, NX), dtype)],
        axis=-3,
    )
    C_el = jnp.concatenate(
        [bcast_h(C_step, (NX, NX)), jnp.zeros(batch + (1, NX, NX), dtype)],
        axis=-3,
    )
    J_el = jnp.concatenate(
        [
            mask[:, None, None] * Qm,
            jnp.broadcast_to(Qm, (1, NX, NX)),
        ],
        axis=0,
    )
    J_el = jnp.broadcast_to(J_el, batch + (h + 1, NX, NX))

    def combine(ej, ei):
        # reverse=True flips the sequence, so fn's FIRST argument is the
        # LATER element: fn(later, earlier) must compute earlier (x) later.
        Ai, Ci, Ji = ei
        Aj, Cj, Jj = ej
        eye = jnp.eye(NX, dtype=dtype)
        D = _ns_posspec_inverse(eye + mm(Ci, Jj), ns_it)
        Dt = tr(D)
        AjD = mm(Aj, D)
        A = mm(AjD, Ai)
        C = mm(mm(AjD, Ci), tr(Aj)) + Cj
        J = mm(mm(tr(Ai), mm(Dt, Jj)), Ai) + Ji
        return A, (C + tr(C)) / 2.0, (J + tr(J)) / 2.0

    _, _, J_suf = jax.lax.associative_scan(
        combine, (A_el, C_el, J_el), reverse=True, axis=A_el.ndim - 3
    )
    P = J_suf[..., 1:, :, :]                # P_{k+1}, k = 0..h-1

    Bh = Bd[..., None, :, :]
    Ah = Ad[..., None, :, :]
    M = jnp.broadcast_to(R_eff, batch + (h, NU, NU)) + mm(
        mm(tr(Bh), P), Bh
    )
    Minv = linalg.ns_inverse(M, iters=ns_it, precision=hi3)
    Qux = mm(mm(tr(Bh), P), Ah)             # (..., h, 12, 13)
    K = mm(Minv, Qux)
    G = mm(tr(Qux), Minv)                   # (..., h, 13, 12)
    Ft = tr(Ah) - mm(G, tr(Bh))
    Acl = Ah - mm(Bh, K)
    Pc = mv(P, prob.c[..., None, :])

    return LQRGains(
        K=K, Minv=Minv, G=G, Ft=Ft, Acl=Acl, Pc=Pc,
        q_stage=jnp.concatenate(
            [jnp.zeros_like(q_lin[..., :1, :]), q_lin[..., : h - 1, :]],
            axis=-2,
        )
        * mask[:, None],
        p_T=q_lin[..., h - 1, :],
    )


def lqr_apply(
    gains: LQRGains,
    prob: StagewiseProblem,
    r_lin: jnp.ndarray,            # (..., h, 12)
) -> jnp.ndarray:
    """Per-iteration LQR solve with precomputed gains: two affine
    associative scans (backward costate, forward closed-loop rollout) —
    no factorization, no small solves, O(log h) depth."""
    h = r_lin.shape[-2]
    dtype = r_lin.dtype
    mv = lambda a, b: jnp.einsum("...ij,...j->...i", a, b)
    mm = lambda a, b: jnp.einsum("...ij,...jk->...ik", a, b)

    # backward: p_k = Ft_k p_{k+1} + s_k;  p_h = p_T
    s = gains.q_stage + mv(gains.Ft, gains.Pc) + mv(gains.G, r_lin)
    F_elems = jnp.concatenate(
        [gains.Ft, jnp.zeros_like(gains.Ft[..., :1, :, :])], axis=-3
    )
    s_elems = jnp.concatenate(
        [s, gains.p_T[..., None, :]], axis=-2
    )

    def aff_rev(ej, ei):
        # reverse=True: first arg is the LATER element (see combine note).
        # earlier ∘ later: v -> F_i (F_j v + s_j) + s_i
        Fi, si = ei
        Fj, sj = ej
        return mm(Fi, Fj), mv(Fi, sj) + si

    _, p_all = jax.lax.associative_scan(
        aff_rev, (F_elems, s_elems), reverse=True, axis=F_elems.ndim - 3
    )
    p_next = p_all[..., 1:, :]              # p_{k+1}, k = 0..h-1

    # kff_k = M^{-1}(B'(Pc_k + p_{k+1}) - r_k)
    BtPp = mv(
        jnp.swapaxes(prob.Bd, -1, -2)[..., None, :, :],
        gains.Pc + p_next,
    )
    kff = mv(gains.Minv, BtPp - r_lin)

    # forward: x_{k+1} = Acl_k x_k + g_k
    g = prob.c[..., None, :] - mv(
        prob.Bd[..., None, :, :], kff
    )

    def aff_fwd(ei, ej):
        # later ∘ earlier (prefix composition in index order)
        Fi, si = ei
        Fj, sj = ej
        return mm(Fj, Fi), mv(Fj, si) + sj

    T_F, T_s = jax.lax.associative_scan(
        aff_fwd, (gains.Acl, g), axis=gains.Acl.ndim - 3
    )
    x_later = mv(T_F, prob.x0[..., None, :]) + T_s   # x_{k+1}, k=0..h-1
    x = jnp.concatenate(
        [prob.x0[..., None, :], x_later[..., : h - 1, :]], axis=-2
    )
    return -mv(gains.K, x) - kff


# ---------------------------------------------------------------------------
# Lane-major ("packed") implementation — the production TPU path.
#
# The (13, 13) value/transition blocks are ~10x smaller than the TPU's
# native (8, 128) vector tile, so the batched-matmul layout (..., 13, 13)
# pads every block to a full tile: measured 4.0 ms per (65536, 13, 13)
# batched matmul on v5e.  Packing the BATCH into the 128-lane minor axis
# instead — arrays (h, 13, 13, B) — turns each block matmul into 13^3
# broadcast-multiply-reduce VPU ops over full lanes: 0.11 ms for the same
# workload (36x; tools/time_block13.py).  All f32 VPU arithmetic, so this
# layout is also EXACTER than the MXU path (no bf16 passes).
# ---------------------------------------------------------------------------


from quad_periodic_mpc_tpu.ops.linalg import (  # noqa: E402
    lane_mm as _pmm,
    lane_mv as _pmv,
    lane_ns_inverse,
    lane_t as _ptr,
)


def _pns_posspec_inverse(
    M: jnp.ndarray, iters: int = NS_COMBINE_ITERS
) -> jnp.ndarray:
    """_ns_posspec_inverse in lane-major layout (exact f32 VPU math)."""
    return lane_ns_inverse(M, iters)


class LQRGainsPacked(NamedTuple):
    """lane-major LQRGains: block arrays are (h, r, c, B), vectors (h, r, B).

    PF_back/PF_fwd/T_F cache the recursive-doubling transition products of
    the backward (Ft) and forward (Acl) affine scans.  The scans' matrix
    parts are ITERATION-INVARIANT — only the vector parts change per ADMM
    iteration — so each lqr_apply level needs one matvec instead of a
    matmul + matvec (13x less work per level)."""

    K: jnp.ndarray
    Minv: jnp.ndarray
    G: jnp.ndarray
    Ft: jnp.ndarray
    Acl: jnp.ndarray
    Pc: jnp.ndarray
    q_stage: jnp.ndarray
    p_T: jnp.ndarray     # (13, B)
    PF_back: tuple       # level-d products of [Ft..., 0]: (h+1, 13, 13, B)
    PF_fwd: tuple        # level-d products of Acl: (h, 13, 13, B)
    T_F: jnp.ndarray     # (h, 13, 13, B) full prefix Acl_k ... Acl_0


def _doubling_products(F: jnp.ndarray, reverse: bool) -> tuple[tuple, jnp.ndarray]:
    """Per-level transition products for a recursive-doubling affine scan.

    For the suffix (reverse=True) recursion p_k = s_k + F_k p_{k+1} the
    level-d update is  v_k += M_k v_{k+d},  M_k <- M_k M_{k+d}  (zero
    past the end); for the prefix (reverse=False) recursion
    x_{k+1} = A_k x_k + g_k it is  v_k += M_k v_{k-d},  M_k <- M_k M_{k-d}.
    Returns (per-level M tuple, final full product)."""
    L = F.shape[0]
    levels = []
    M = F
    d = 1
    while d < L:
        levels.append(M)
        if reverse:
            # past-the-end transitions are zero (the terminal element's F
            # is the zero block), matching the zero-padded vector shifts
            Ms = jnp.concatenate([M[d:], jnp.zeros_like(M[:d])], axis=0)
        else:
            # before-the-start products are complete already: identity pad
            eye = jnp.broadcast_to(
                jnp.eye(M.shape[1], dtype=M.dtype)[..., None], M[:d].shape
            )
            Ms = jnp.concatenate([eye, M[:-d]], axis=0)
        M = _pmm(M, Ms)
        d *= 2
    return tuple(levels), M


def _doubling_apply(
    levels: tuple, v: jnp.ndarray, reverse: bool
) -> jnp.ndarray:
    """Run the vector half of the doubling scan with cached products."""
    d = 1
    for M in levels:
        if reverse:
            vs = jnp.concatenate([v[d:], jnp.zeros_like(v[:d])], axis=0)
        else:
            vs = jnp.concatenate([jnp.zeros_like(v[:d]), v[:-d]], axis=0)
        v = v + _pmv(M, vs)
        d *= 2
    return v


def lqr_factorize_packed(
    Ad: jnp.ndarray,      # (13, 13, B)
    Bd: jnp.ndarray,      # (13, 12, B)
    c: jnp.ndarray,       # (1 or h, 13, B) per-step affine term
    x_ref: jnp.ndarray,   # (h, 13, B)
    Q: jnp.ndarray,       # (13,)
    R: jnp.ndarray,       # (12,)
    R_eff_diag_extra: jnp.ndarray,   # (3, 3)
) -> LQRGainsPacked:
    """lqr_factorize in lane-major layout (same math, see its docstring)."""
    h = x_ref.shape[0]
    B = x_ref.shape[-1]
    dtype = x_ref.dtype
    ns_it = ns_combine_iters(h)
    from quad_periodic_mpc_tpu.ops import linalg

    Qm = jnp.diag(Q).astype(dtype)[..., None]                 # (13, 13, 1)
    R_eff = jnp.diag(R).astype(dtype) + jnp.kron(
        jnp.eye(4, dtype=dtype), R_eff_diag_extra.astype(dtype)
    )                                                          # (12, 12)
    R_inv = linalg.ns_inverse(
        R_eff, iters=30, precision=jax.lax.Precision.HIGHEST
    )
    C_step = _pmm(_pmm(Bd, R_inv[..., None]), _ptr(Bd))        # (13, 13, B)

    q_lin = -(Q.astype(dtype)[None, :, None] * x_ref)          # (h, 13, B)
    mask = jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.ones((h - 1,), dtype)]
    )

    zblk = jnp.zeros((1, NX, NX, B), dtype)
    A_el = jnp.concatenate(
        [jnp.broadcast_to(Ad[None], (h, NX, NX, B)), zblk], axis=0
    )
    C_el = jnp.concatenate(
        [jnp.broadcast_to(C_step[None], (h, NX, NX, B)), zblk], axis=0
    )
    J_el = jnp.concatenate(
        [mask[:, None, None, None] * Qm[None], Qm[None]], axis=0
    )
    J_el = jnp.broadcast_to(J_el, (h + 1, NX, NX, B))

    eye = jnp.eye(NX, dtype=dtype)[..., None]

    def combine(ej, ei):
        # reverse=True flips the sequence: first arg is the LATER element
        Ai, Ci, Ji = ei
        Aj, Cj, Jj = ej
        D = _pns_posspec_inverse(eye + _pmm(Ci, Jj), ns_it)
        AjD = _pmm(Aj, D)
        A = _pmm(AjD, Ai)
        C = _pmm(_pmm(AjD, Ci), _ptr(Aj)) + Cj
        J = _pmm(_pmm(_ptr(Ai), _pmm(_ptr(D), Jj)), Ai) + Ji
        return A, (C + _ptr(C)) / 2.0, (J + _ptr(J)) / 2.0

    _, _, J_suf = jax.lax.associative_scan(
        combine, (A_el, C_el, J_el), reverse=True, axis=0
    )
    P = J_suf[1:]                                              # (h,13,13,B)

    Bh = Bd[None]
    Ah = Ad[None]
    BtP = _pmm(_ptr(Bh), P)                                    # (h,12,13,B)
    M = R_eff[None, :, :, None] + _pmm(BtP, Bh)
    Minv = _pns_posspec_inverse(M, ns_it)
    Qux = _pmm(BtP, Ah)                                        # (h,12,13,B)
    K = _pmm(Minv, Qux)
    G = _pmm(_ptr(Qux), Minv)                                  # (h,13,12,B)
    Ft = _ptr(Ah) - _pmm(G, _ptr(Bh))
    Acl = Ah - _pmm(Bh, K)
    Pc = _pmv(P, c)

    q_stage = jnp.concatenate(
        [jnp.zeros((1, NX, B), dtype), q_lin[: h - 1]], axis=0
    )
    F_elems = jnp.concatenate(
        [Ft, jnp.zeros((1, NX, NX, B), dtype)], axis=0
    )
    PF_back, _ = _doubling_products(F_elems, reverse=True)
    PF_fwd, T_F = _doubling_products(Acl, reverse=False)
    return LQRGainsPacked(
        K=K, Minv=Minv, G=G, Ft=Ft, Acl=Acl, Pc=Pc,
        q_stage=q_stage, p_T=q_lin[h - 1],
        PF_back=PF_back, PF_fwd=PF_fwd, T_F=T_F,
    )


def lqr_apply_packed(
    gains: LQRGainsPacked,
    Bd: jnp.ndarray,       # (13, 12, B)
    c: jnp.ndarray,        # (1 or h, 13, B) per-step affine term
    x0: jnp.ndarray,       # (13, B)
    r_lin: jnp.ndarray,    # (h, 12, B)
) -> jnp.ndarray:
    """lqr_apply in lane-major layout: returns U (h, 12, B)."""
    h = r_lin.shape[0]

    s = gains.q_stage + _pmv(gains.Ft, gains.Pc) + _pmv(gains.G, r_lin)
    s_elems = jnp.concatenate([s, gains.p_T[None]], axis=0)

    # backward costate: doubling scan with cached transition products —
    # matvec-only per level (the matmul half lives in lqr_factorize_packed)
    p_all = _doubling_apply(gains.PF_back, s_elems, reverse=True)
    p_next = p_all[1:]

    BtPp = _pmv(_ptr(Bd)[None], gains.Pc + p_next)
    kff = _pmv(gains.Minv, BtPp - r_lin)
    g = c - _pmv(Bd[None], kff)

    # forward closed-loop rollout: same cached-product doubling scan
    T_s = _doubling_apply(gains.PF_fwd, g, reverse=False)
    x_later = _pmv(gains.T_F, x0[None]) + T_s
    x = jnp.concatenate([x0[None], x_later[: h - 1]], axis=0)
    return -_pmv(gains.K, x) - kff


def _pcone_apply(F: jnp.ndarray, U: jnp.ndarray) -> jnp.ndarray:
    """(h, 12, B) -> (h, 20, B): per-leg F u (5 rows/leg, leg-major)."""
    h, _, B = U.shape
    u4 = U.reshape(h, 4, 3, B)
    Fu = (F[None, None, :, :, None] * u4[:, :, None, :, :]).sum(-2)
    return Fu.reshape(h, 20, B)


def _pcone_apply_T(F: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
    """(h, 20, B) -> (h, 12, B): per-leg F^T v."""
    h, _, B = V.shape
    v4 = V.reshape(h, 4, 5, B)
    r = (F[None, None, :, :, None] * v4[..., None, :]).sum(2)
    return r.reshape(h, 12, B)


def solve(
    prob: StagewiseProblem,
    cfg: ADMMConfig,
    warm: tuple | None = None,
) -> tuple[jnp.ndarray, dict]:
    """ADMM with Riccati x-update.  Returns (U (..., h, 12), info).

    Production path: lane-major packed layout (batch in the 128-lane
    minor axis; see the layout note above lqr_factorize_packed).  The
    batched-matmul implementations (lqr_factorize/lqr_apply) are kept as
    the cross-check reference (solve_blocked).

    warm: optional (U, z, y) from the previous MPC step, shaped like the
    outputs ((..., h, 12), (..., h, 20), (..., h, 20)) — carries the ADMM
    operator state across control steps (same convention as qp_admm).
    prob.c may be per-step (..., h, 13) (predictive disturbance horizon)
    or time-invariant (..., 13).
    """
    dtype = prob.x0.dtype
    h = prob.x_ref.shape[-2]
    batch = prob.x0.shape[:-1]
    B = 1
    for d in batch:
        B *= d

    # The fused kernel holds per-stage gains (K, Quu^{-1}) plus the
    # stage sequences VMEM-resident; h > 40 switches to the kernel's
    # lean layout (packed symmetric Quu^{-1}, recomputed sweep
    # scratches) which fits to h = 64; past that a gains-streaming
    # variant (DMA double-buffered K/Quu^{-1}) carries to h = 128,
    # beyond which fall back to XLA.  The kernel is f32-internal, so
    # f64 problems stay on the XLA path instead of silently demoting
    # (ADVICE r4).
    use_stream = 64 < h <= 128 and h % 8 == 0
    if cfg.backend == "pallas" and dtype == jnp.float32 and (
        h <= 64 or use_stream
    ):
        # fused kernel: factorize + all iterations VMEM-resident per
        # 128-lane chunk (ops/pallas/stagewise_kernel.py); h > 64
        # streams the per-stage gains through double-buffered VMEM
        # (fused_stagewise_solve_stream)
        from quad_periodic_mpc_tpu.ops.pallas import stagewise_kernel

        flat = lambda t, *extra: jnp.broadcast_to(
            t, batch + extra
        ).reshape((B,) + extra)
        per_step_c = prob.c.ndim == prob.x0.ndim + 1
        c_flat = (
            flat(prob.c, h, NX) if per_step_c else flat(prob.c, NX)
        )
        if warm is None:
            U0 = jnp.zeros((B, h, NU), dtype)
            z0 = jnp.zeros((B, h, 20), dtype)
            y0 = jnp.zeros((B, h, 20), dtype)
        else:
            U0, z0, y0 = (
                flat(t, h, r) for t, r in zip(warm, (NU, 20, 20))
            )
        R_eff = jnp.diag(prob.R.astype(dtype)) + cfg.rho * jnp.kron(
            jnp.eye(4, dtype=dtype),
            jnp.swapaxes(prob.F, -1, -2) @ prob.F,
        )
        solve_fn = (
            stagewise_kernel.fused_stagewise_solve_stream if use_stream
            else stagewise_kernel.fused_stagewise_solve
        )
        U, z, y = solve_fn(
            flat(prob.Ad, NX, NX), flat(prob.Bd, NX, NU), c_flat,
            flat(prob.x0, NX), flat(prob.x_ref, h, NX),
            prob.Q.astype(dtype), R_eff, prob.F.astype(dtype),
            flat(prob.l, h, 20), flat(prob.u, h, 20),
            U0, z0, y0, iters=cfg.iterations, rho=float(cfg.rho),
            over_relax=float(cfg.over_relax),
            ns_it=ns_combine_iters(h),
            interpret=jax.default_backend() == "cpu",
        )
        unflat = lambda t: t.reshape(batch + t.shape[1:]).astype(dtype)
        return unflat(U), {"z": unflat(z), "y": unflat(y)}

    # pack: leading batch dims -> single minor lane axis
    pm = lambda t, r, c_: jnp.moveaxis(
        jnp.broadcast_to(t, batch + (r, c_)).reshape((B, r, c_)), 0, -1
    )
    pv = lambda t, r: jnp.moveaxis(
        jnp.broadcast_to(t, batch + (r,)).reshape((B, r)), 0, -1
    )
    pseq = lambda t, r: jnp.moveaxis(
        jnp.broadcast_to(t, batch + (h, r)).reshape((B, h, r)), 0, -1
    )                         # (B, h, r) -> (h, r, B)

    Ad = pm(prob.Ad, NX, NX)
    Bd = pm(prob.Bd, NX, NU)
    per_step_c = prob.c.ndim == prob.x0.ndim + 1   # (..., h, 13) vs (..., 13)
    c = pseq(prob.c, NX) if per_step_c else pv(prob.c, NX)[None]
    x0 = pv(prob.x0, NX)
    x_ref = pseq(prob.x_ref, NX)
    l_p = pseq(prob.l, 20)
    u_p = pseq(prob.u, 20)

    rho = jnp.asarray(cfg.rho, dtype)
    G = rho * (jnp.swapaxes(prob.F, -1, -2) @ prob.F)
    gains = lqr_factorize_packed(
        Ad, Bd, c, x_ref, prob.Q.astype(dtype), prob.R.astype(dtype), G
    )

    if warm is None:
        z = jnp.zeros((h, 20, B), dtype)
        y = jnp.zeros((h, 20, B), dtype)
        U = jnp.zeros((h, NU, B), dtype)
    else:
        U, z, y = (pseq(t, r) for t, r in zip(warm, (NU, 20, 20)))
    F = prob.F.astype(dtype)

    a = jnp.asarray(cfg.over_relax, dtype)

    def iteration(carry, _):
        U, z, y = carry
        r_lin = _pcone_apply_T(F, rho * z - y)
        U_t = lqr_apply_packed(gains, Bd, c, x0, r_lin)
        # over-relaxation (same alpha/semantics as the condensed OSQP
        # iteration, qp_admm.solve): relax both the iterate carry and
        # the constraint image before the projection — ~1.5x fewer
        # iterations to a given residual on this family (measured;
        # what qualified the h=16 stagewise line for production)
        U_new = a * U_t + (1.0 - a) * U
        Fu_t = _pcone_apply(F, U_t)
        Fu_r = a * Fu_t + (1.0 - a) * z
        z_new = jnp.clip(Fu_r + y / rho, l_p, u_p)
        y_new = y + rho * (Fu_r - z_new)
        return (U_new, z_new, y_new), None

    (U, z, y), _ = jax.lax.scan(
        iteration, (U, z, y), None, length=cfg.iterations
    )
    # unpack: (h, r, B) -> (batch..., h, r)
    unpack = lambda t: jnp.moveaxis(t, -1, 0).reshape(batch + t.shape[:-1])
    return unpack(U), {"z": unpack(z), "y": unpack(y)}


def kkt_residuals(
    prob: StagewiseProblem,
    U: jnp.ndarray,        # (..., h, 12)
    z: jnp.ndarray,        # (..., h, 20)
    y: jnp.ndarray,        # (..., h, 20)
) -> dict[str, jnp.ndarray]:
    """Primal/dual residual norms (per instance) for the stagewise solve.

    Same quantities as qp_admm.kkt_residuals, computed natively in stage
    space (the condensed P/q are f32-meaningless past h ~ 20, which is
    the whole point of this path): the stagewise objective equals the
    condensed one exactly (module docstring), so its gradient
    grad_k = R u_k + Bd' mu_{k+1} — with the costate recursion
    mu_k = Q (x_k - xref_{k-1}) + Ad' mu_{k+1} over the rolled-out
    states — is the same vector qp_admm audits as P x + q.  All
    matmul-like contractions run at HIGHEST precision (the audit must
    not be noisier than what it audits).
    """
    hp = jax.lax.Precision.HIGHEST
    h = U.shape[-2]
    dtype = U.dtype
    mv = lambda a, b: jnp.einsum("...ij,...j->...i", a, b, precision=hp)
    batch = prob.x0.shape[:-1]
    Ad = jnp.broadcast_to(prob.Ad, batch + (NX, NX))
    Bd = jnp.broadcast_to(prob.Bd, batch + (NX, NU))
    per_step_c = prob.c.ndim == prob.x0.ndim + 1
    c_seq = (
        jnp.moveaxis(jnp.broadcast_to(prob.c, batch + (h, NX)), -2, 0)
        if per_step_c
        else jnp.broadcast_to(prob.c, (h,) + batch + (NX,))
    )
    U_t = jnp.moveaxis(jnp.broadcast_to(U, batch + (h, NU)), -2, 0)

    # forward rollout x_1..x_h
    def fwd(x, inp):
        u_k, c_k = inp
        x_next = mv(Ad, x) + mv(Bd, u_k) + c_k
        return x_next, x_next

    _, xs = jax.lax.scan(fwd, prob.x0, (U_t, c_seq))       # (h, ..., 13) = x_1..x_h

    # costate backward: mu_k = Q (x_k - xref_{k-1}) + Ad' mu_{k+1}
    Qd = prob.Q.astype(dtype)
    xref_t = jnp.moveaxis(
        jnp.broadcast_to(prob.x_ref, batch + (h, NX)), -2, 0
    )
    grad_x = Qd * (xs - xref_t)                             # (h, ..., 13)
    AdT = jnp.swapaxes(Ad, -1, -2)

    def bwd(mu, gx):
        mu_new = gx + mv(AdT, mu)
        return mu_new, mu_new

    _, mus = jax.lax.scan(
        bwd, jnp.zeros(batch + (NX,), dtype), grad_x, reverse=True
    )                                                       # mus[k] = mu_{k+1}
    BdT = jnp.swapaxes(Bd, -1, -2)
    grad_u = prob.R.astype(dtype) * U_t + mv(BdT, mus)      # (h, ..., 12)
    grad_u = jnp.moveaxis(grad_u, 0, -2)                    # (..., h, 12)

    F = prob.F.astype(dtype)
    u4 = U.reshape(batch + (h, 4, 3))
    ax = jnp.einsum("ca,...ka->...kc", F, u4, precision=hp)
    ax = ax.reshape(batch + (h, 20))
    y4 = y.reshape(batch + (h, 4, 5))
    fty = jnp.einsum("ca,...kc->...ka", F, y4, precision=hp)
    fty = fty.reshape(batch + (h, 12))

    r_prim = jnp.max(jnp.abs(ax - z), axis=(-1, -2))
    r_dual = jnp.max(jnp.abs(grad_u + fty), axis=(-1, -2))
    viol = jnp.maximum(ax - prob.u, prob.l - ax)
    r_feas = jnp.max(jnp.maximum(viol, 0.0), axis=(-1, -2))
    return {"primal": r_prim, "dual": r_dual, "feas": r_feas}


def solve_blocked(
    prob: StagewiseProblem, cfg: ADMMConfig
) -> tuple[jnp.ndarray, dict]:
    """ADMM with Riccati x-update in batched-matmul layout (cross-check
    reference for solve; same math, MXU-tiled (..., 13, 13) blocks)."""
    dtype = prob.x0.dtype
    h = prob.x_ref.shape[-2]
    batch = prob.x0.shape[:-1]

    l_flat = prob.l
    u_flat = prob.u
    # Uniform rho: the Riccati u-update needs a single quadratic penalty
    # rho F^T F per stage.  (A row-dependent rho can be emulated by
    # folding (rho_max - rho) F u into the linear term, but the lag makes
    # ADMM stall when the ratio is large, so eq_scale is deliberately NOT
    # applied here; swing feet are still pinned by their [0, 0] bounds.)
    rho = jnp.asarray(cfg.rho, dtype)
    rho_q = rho
    G = rho_q * (jnp.swapaxes(prob.F, -1, -2) @ prob.F)

    z = jnp.zeros(batch + (h, 20), dtype)
    y = jnp.zeros(batch + (h, 20), dtype)
    U = jnp.zeros(batch + (h, NU), dtype)

    # factorize ONCE: the LQR quadratics don't depend on the iterate
    gains = lqr_factorize(prob, G)

    a = jnp.asarray(cfg.over_relax, dtype)

    def iteration(carry, _):
        U, z, y = carry
        r_lin = con.apply_T(
            prob.F, (rho * z - y).reshape(batch + (h * 20,))
        ).reshape(batch + (h, NU))
        U_t = lqr_apply(gains, prob, r_lin)
        U_new = a * U_t + (1.0 - a) * U
        Fu_t = con.apply(prob.F, U_t.reshape(batch + (h * NU,))).reshape(
            batch + (h, 20)
        )
        Fu_r = a * Fu_t + (1.0 - a) * z
        z_new = jnp.clip(Fu_r + y / rho, l_flat, u_flat)
        y_new = y + rho * (Fu_r - z_new)
        return (U_new, z_new, y_new), None

    (U, z, y), _ = jax.lax.scan(
        iteration, (U, z, y), None, length=cfg.iterations
    )
    return U, {"z": z, "y": y}
