"""Fused stagewise Riccati-ADMM Pallas kernel.

The XLA stagewise path (ops/qp_stagewise.py) is factorization-bound on
TPU: the associative-scan Riccati + its per-combine Newton-Schulz
inverses compile to ~10^3 tiny lane-major kernels whose HBM round-trips
and launches cost ~20-30 ms at h=16, batch 1024 — 10x above the
arithmetic.  This kernel fuses the ENTIRE solve (factorize + all ADMM
iterations) per 128-lane batch chunk with everything VMEM-resident:

- the associative scan is replaced by a SEQUENTIAL backward Riccati —
  inside one kernel there is no per-step launch or HBM cost, which was
  the only reason the O(log h) scan existed, and the sequential
  recursion runs exact f32 VPU math (better than the scan's HIGH-
  precision bf16 passes);
- per-stage gains (K, Quu^{-1}, P c) stay resident in VMEM scratch
  across all ADMM iterations;
- G = Qux' Minv never materializes: Minv is symmetric, so G = K' and
  every G matvec is a K-transpose matvec;
- each ADMM iteration is one backward costate sweep + one forward
  closed-loop rollout (sequential over stages, all VPU) + vectorized
  cone/projection updates.

Layout: instances ride the LANE axis (chunk C = 128); every block
matmul/matvec is an unrolled sum of row-broadcast multiplies over full
lanes (the 13x13 blocks are ~100x below the MXU tile, ops/qp_stagewise
layout note).  Lane-major block ops are exact f32 on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX = 13
NU = 12
NC = 20


def _mm(a, b, n_k):
    """Lane matmul: (r, k, C) x (k, s, C) -> (r, s, C) as k fused
    multiply-adds of (r, s, C) tiles."""
    acc = a[:, 0, :][:, None, :] * b[0][None, :, :]
    for k in range(1, n_k):
        acc = acc + a[:, k, :][:, None, :] * b[k][None, :, :]
    return acc


def _mv(a, v, n_k):
    """Lane matvec: (r, k, C) x (k, C) -> (r, C)."""
    acc = a[:, 0, :] * v[0][None, :]
    for k in range(1, n_k):
        acc = acc + a[:, k, :] * v[k][None, :]
    return acc


def _tmv(a, v, n_r):
    """Transposed lane matvec: (r, k, C) x (r, C) -> (k, C)
    (contract over the LEADING dim)."""
    acc = a[0] * v[0][None, :]
    for r in range(1, n_r):
        acc = acc + a[r] * v[r][None, :]
    return acc


def _t(a, r, c):
    """Lane transpose (r, c, C) -> (c, r, C) via stack of rows."""
    return jnp.stack([a[:, j, :] for j in range(c)], axis=0)


# upper-triangle index pairs for packed symmetric (NU, NU) storage
_SYM_IDX = [(i, j) for i in range(NU) for j in range(i, NU)]   # 78 pairs
NPACK = len(_SYM_IDX)

# Sparsity of N = Ad - I for the nilpotent SRB ZOH (models/srb.py
# ct_dynamics + discretize.nilpotent_zoh, and _srb_assemble below):
# A_ct rows {0:3} <- cols {6:9} (R^T), rows {3:6} <- cols {9:12},
# row 11 <- cols {9 (x_drag), 12 (gravity)}; A^2 touches only row 5
# (cols 9, 12); A^3 = 0.  So Ad = I + N with N supported on exactly
# these rows/columns — every Ad contraction can skip the identity part
# and contract only the 7 live rows (or columns).  Bd row 12 is
# exactly zero (gravity state takes no input), so NX-contractions
# against Bd/BdT drop their k = 12 term.
_N_ROWS = (0, 1, 2, 3, 4, 5, 11)   # nonzero rows of N (= cols of N^T)
_N_COLS = (6, 7, 8, 9, 10, 11, 12)  # nonzero cols of N


def _ad_ops(Ad, AdT, srb_ad):
    """Ad contraction helpers for the solve kernels.

    srb_ad=True exploits Ad = I + N (sparsity above): each product is
    the identity pass-through plus 7 live-row FMAs instead of 13 dense
    ones, and `nbd` = NU lets NX-contractions against Bd/BdT skip the
    structurally-zero k = 12 term.  Exact, not approximate.  Returns
    (mv_A, mv_AT, mm_r_A, mm_l_AT, nbd)."""
    f32 = jnp.float32
    if not srb_ad:
        return (
            lambda x: _mv(Ad, x, NX),
            lambda v: _mv(AdT, v, NX),
            lambda X: _mm(X, Ad, NX),
            lambda P: _mm(AdT, P, NX),
            NX,
        )
    rid = jax.lax.broadcasted_iota(jnp.int32, (NX, 1), 0)
    Nrow = {k: Ad[k] - jnp.where(rid == k, 1.0, 0.0).astype(f32)
            for k in _N_ROWS}
    Ncol = {k: Ad[:, k, :] - jnp.where(rid == k, 1.0, 0.0).astype(f32)
            for k in _N_COLS}

    def mv_A(x):                                    # Ad @ x
        acc = x
        for k in _N_COLS:
            acc = acc + Ncol[k] * x[k][None, :]
        return acc

    def mv_AT(v):                                   # Ad^T @ v
        acc = v
        for k in _N_ROWS:
            acc = acc + Nrow[k] * v[k][None, :]
        return acc

    def mm_r_A(X):                                  # X @ Ad, X (r, NX, C)
        acc = X
        for k in _N_ROWS:
            acc = acc + X[:, k, :][:, None, :] * Nrow[k][None, :, :]
        return acc

    def mm_l_AT(P):                                 # Ad^T @ P, P (NX, s, C)
        acc = P
        for k in _N_ROWS:
            acc = acc + Nrow[k][:, None, :] * P[k][None, :, :]
        return acc

    return mv_A, mv_AT, mm_r_A, mm_l_AT, NU


def _stage_quu_inverse(Quu, X_prev, first, eyeu, C, ns_it, ns_warm):
    """Per-stage Quu^{-1} by Newton-Schulz, shared by the VMEM-resident
    and gains-streaming kernels.

    first stage: cold scalar seed I/||Quu||_inf, full ns_it rounds.
    Later stages: seed from the previous stage's inverse (Quu varies by
    one Riccati step along the horizon, so Xp is near-contractive);
    jumped lanes get the spectral alpha-rescale
    (linalg.ns_inverse_bucket argument: M = Xp Quu has real positive
    spectrum <= 1 + r, alpha = 1.8/(1+r) contracts).  ns_warm rounds
    are sized for the TYPICAL one-step drift (quadratic convergence in
    4-5 rounds); the post-loop residual gate — threshold 2e-3, the
    worst residual the old 10-round blind loop accepted from an
    alpha-rescaled 0.9 start — catches slow lanes (early stages where
    P jumps from the terminal cost, genuinely ill-conditioned Quu, or
    non-finites) and reruns those stages from the cold scalar seed
    (ADVICE r4 rescue, mirroring linalg.ns_inverse_bucket).  The
    lax.cond on the per-chunk ANY keeps the rescue free on the healthy
    path."""
    def ns_round(_, X):
        MX = _mm(Quu, X, NU)
        return _mm(X, 2.0 * eyeu - MX, NU)

    def cold_seed():
        absQ = jnp.abs(Quu)
        row = absQ[:, 0, :]
        for j in range(1, NU):
            row = row + absQ[:, j, :]
        norm = row[0]
        for i in range(1, NU):
            norm = jnp.maximum(norm, row[i])        # (C,)
        return jnp.broadcast_to(eyeu, (NU, NU, C)) / norm[None, None, :]

    def cold(Xp):
        return jax.lax.fori_loop(0, ns_it, ns_round, cold_seed())

    def warm(Xp):
        M = _mm(Xp, Quu, NU)
        E = jnp.abs(eyeu - M)
        row = E[:, 0, :]
        for j in range(1, NU):
            row = row + E[:, j, :]
        r = row[0]
        for i in range(1, NU):
            r = jnp.maximum(r, row[i])              # (C,)
        alpha = jnp.where(r < 0.9, 1.0, 1.8 / (1.0 + r))
        # round 1 reuses the seed product: X1 = a Xp (2I - a M)
        X = _mm(alpha[None, None, :] * Xp,
                2.0 * eyeu - alpha[None, None, :] * M, NU)
        X = jax.lax.fori_loop(0, ns_warm - 1, ns_round, X)
        QX = _mm(Quu, X, NU)
        Eabs = jnp.abs(eyeu - QX)
        rrow = Eabs[:, 0, :]
        for j in range(1, NU):
            rrow = rrow + Eabs[:, j, :]
        err = rrow[0]
        for i in range(1, NU):
            err = jnp.maximum(err, rrow[i])         # (C,)
        bad = jnp.logical_not(err < 2e-3)           # catches NaN too

        def rescue(Xb):
            Xb = jnp.where(bad[None, None, :], cold_seed(), Xb)
            Xb = jnp.where(jnp.isfinite(Xb), Xb, 0.0)
            return jax.lax.fori_loop(0, ns_it, ns_round, Xb)

        return jax.lax.cond(jnp.any(bad), rescue, lambda x: x, X)

    return jax.lax.cond(first, cold, warm, X_prev)


def _pack_sym(M):
    """(NU, NU, C) symmetric -> (NPACK, C)."""
    return jnp.stack([M[i, j, :] for (i, j) in _SYM_IDX], axis=0)


def _unpack_sym(Pk):
    """(NPACK, C) -> (NU, NU, C)."""
    rows = [[None] * NU for _ in range(NU)]
    for idx, (i, j) in enumerate(_SYM_IDX):
        rows[i][j] = Pk[idx]
        rows[j][i] = Pk[idx]
    return jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)


def _solve_body(
    Ad,           # (NX, NX, C) value
    Bd,           # (NX, NU, C) value
    c_get,        # k -> (NX, C) per-stage affine term
    x0_ref, xref_ref, l_ref, u_ref, U0_ref, z0_ref, y0_ref,
    Qm_ref, Reff_ref, A20_ref,
    U_out, z_out, y_out,
    scratch,      # tuple of VMEM refs, layout depends on `lean`
    *,
    h: int,
    iters: int,
    rho: float,
    over_relax: float,
    ns_it: int,
    lean: bool = False,
    srb_ad: bool = True,
    ns_warm: int | None = None,
):
    # lean mode (long horizons, h > 40): Quu^{-1} stored PACKED
    # symmetric (78 rows instead of a 12x16-sublane-padded block) and
    # the r_lin / q_stage scratches dropped (recomputed per sweep) —
    # ~5 MB less VMEM at h = 64, the difference between fitting and
    # not.  Costs ~5-8% extra iteration arithmetic; the short-horizon
    # lines keep the fast layout.
    if lean:
        K_scr, Minv_scr, Pc_scr, P_scr, p_scr = scratch
        kf_scr = q_scr = None
    else:
        K_scr, Minv_scr, Pc_scr, P_scr, p_scr, kf_scr, q_scr = scratch
    C = Ad.shape[-1]
    f32 = jnp.float32
    AdT = _t(Ad, NX, NX)
    BdT = _t(Bd, NX, NU)
    Qm = Qm_ref[:][:, :, None]                      # (NX, NX, 1) bcast
    Reff = Reff_ref[:][:, :, None]
    A20 = A20_ref[:]                                # (NC, NU)
    hp = jax.lax.Precision.HIGHEST

    # Structured Ad contractions (srb_ad): ~25% of the Riccati matmul
    # elements and 2 of the 4 sweep matvecs per iteration stage.
    mv_A, mv_AT, mm_r_A, mm_l_AT, nbd = _ad_ops(Ad, AdT, srb_ad)

    # ---- factorize: sequential backward Riccati ----
    # terminal P_h = Qm
    P_scr[:] = jnp.broadcast_to(Qm, (NX, NX, C)).astype(f32)

    eyeu = jax.lax.broadcasted_iota(jnp.int32, (NU, NU), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (NU, NU), 1)
    eyeu = jnp.where(eyeu, 1.0, 0.0).astype(f32)[:, :, None]
    # Warm NS rounds are sized for the TYPICAL stage-to-stage Quu drift
    # (one Riccati step, residual ~0.1-0.3 -> quadratic convergence in
    # 4-5 rounds); the tightened post-loop residual gate below (2e-3,
    # was 0.9) catches the rare slow lanes — early stages where P jumps
    # from the terminal cost, or alpha-rescaled jumped seeds that start
    # near residual 0.9 — and reruns those STAGES from the cold scalar
    # seed.  Round 4 ran 10 blind warm rounds sized for the worst case;
    # the gate makes the worst case a measured branch instead of a
    # every-stage tax (~16% of the kernel's VPU elements).
    if ns_warm is None:
        ns_warm = max(ns_it * 3 // 8, 6)

    def backward_stage(kk, X_prev):
        k = h - 1 - kk
        P = P_scr[:]
        BtP = _mm(BdT, P, nbd)                      # (NU, NX, C)
        Quu = Reff + _mm(BtP, Bd, nbd)              # (NU, NU, C)
        Minv = _stage_quu_inverse(
            Quu, X_prev, kk == 0, eyeu, C, ns_it, ns_warm
        )
        Qux = mm_r_A(BtP)                           # (NU, NX, C)
        K = _mm(Minv, Qux, NU)                      # (NU, NX, C)
        K_scr[k] = K
        Minv_scr[k] = _pack_sym(Minv) if lean else Minv
        Pc_scr[k] = _mv(P, c_get(k), NX)
        # P_k = mask_k Qm + Ad' P Ad - Qux' K  (mask_k = 0 at k = 0,
        # where P is never used — skip the masking, stage 0's P is dead)
        AtP = mm_l_AT(P)
        P_new = Qm + mm_r_A(AtP) - _mm(_t(Qux, NU, NX), K, NU)
        P_new = (P_new + _t(P_new, NX, NX)) / 2.0
        P_scr[:] = P_new
        return Minv

    jax.lax.fori_loop(
        0, h, backward_stage,
        jnp.zeros((NU, NU, C), f32),
    )

    # ---- ADMM iterations ----
    a = over_relax
    rho_inv = 1.0 / rho
    A20T = A20.T

    # hoist the per-stage linear state cost OUT of the iteration loop:
    # q_stage_k = -Q xref_{k-1} (zero at k = 0), q_T = -Q xref_{h-1}.
    # Q is diagonal, so this is an elementwise scale of xref — stored
    # once in q_scr; rebuilding the (NX, NX, C) broadcast + matvec per
    # stage per iteration was ~15% of the iteration cost.
    Qd = jnp.stack([Qm[i, i, :] for i in range(NX)], axis=0)  # (NX, 1)

    if not lean:
        def build_q(k, _):
            km1 = jnp.maximum(k - 1, 0)
            qs = -(Qd * xref_ref[km1])
            q_scr[k] = jnp.where(k >= 1, qs, jnp.zeros_like(qs))
            return 0

        jax.lax.fori_loop(0, h, build_q, 0)
    qT = -(Qd * xref_ref[h - 1])

    def iteration(_, carry):
        # carries live in the out refs (U, z, y)
        # backward costate: p_h = -Q xref_{h-1}; store p_{k+1} per k.
        # The r_lin pass is FUSED into this sweep (r_k only depends on
        # z_k, y_k — no cross-stage coupling), saving one h-length
        # dynamic-index loop per iteration.
        def bwd(kk, p):
            k = h - 1 - kk
            w = rho * z_out[k] - y_out[k]           # (NC, C)
            rk = jnp.dot(
                A20T, w, preferred_element_type=f32, precision=hp
            )
            if not lean:
                kf_scr[k] = rk
            # s_k = q_stage_k + Ft_k (Pc_k + p) + K_k' r_k
            # Ft_k v = Ad' v - K_k' (Bd' v); the two K' matvecs merge:
            # -K'(Bd'v) + K'rk = -K'(Bd'v - rk) — one _tmv, not two.
            # p_scr stores v = Pc + p (what fwd actually consumes).
            K = K_scr[k]
            v = Pc_scr[k] + p
            p_scr[k] = v
            if lean:
                km1 = jnp.maximum(k - 1, 0)
                qs = -(Qd * xref_ref[km1])
                qk = jnp.where(k >= 1, qs, jnp.zeros_like(qs))
            else:
                qk = q_scr[k]
            return qk + mv_AT(v) - _tmv(
                K, _mv(BdT, v, nbd)[:NU] - rk, NU
            )

        jax.lax.fori_loop(0, h, bwd, qT)

        # forward closed-loop rollout + relaxed updates
        def fwd(k, x):
            K = K_scr[k]
            if lean:
                # z/y not yet updated for stage k: same rk as bwd saw
                w = rho * z_out[k] - y_out[k]
                rk = jnp.dot(
                    A20T, w, preferred_element_type=f32, precision=hp
                )
                Minv_k = _unpack_sym(Minv_scr[k])
            else:
                rk = kf_scr[k]
                Minv_k = Minv_scr[k]
            BtPp = _mv(BdT, p_scr[k], nbd)          # p_scr holds Pc + p
            kff = _mv(Minv_k, BtPp - rk, NU)
            u_t = -_mv(K, x, NX) - kff              # (NU, C)
            x_new = mv_A(x) + _mv(Bd, u_t, NU) + c_get(k)
            Fu_t = jnp.dot(
                A20, u_t, preferred_element_type=f32, precision=hp
            )                                        # (NC, C)
            z = z_out[k]
            y = y_out[k]
            U_out[k] = a * u_t + (1.0 - a) * U_out[k]
            Fu_r = a * Fu_t + (1.0 - a) * z
            z_new = jnp.clip(Fu_r + rho_inv * y, l_ref[k], u_ref[k])
            z_out[k] = z_new
            y_out[k] = y + rho * (Fu_r - z_new)
            return x_new

        jax.lax.fori_loop(0, h, fwd, x0_ref[:])
        return carry

    # seed carries
    def seed(k, _):
        U_out[k] = U0_ref[k]
        z_out[k] = z0_ref[k]
        y_out[k] = y0_ref[k]
        return 0

    jax.lax.fori_loop(0, h, seed, 0)
    jax.lax.fori_loop(0, iters, iteration, 0)


def _kernel(
    Ad_ref,       # (NX, NX, C)
    Bd_ref,       # (NX, NU, C)
    c_ref,        # (h, NX, C)
    x0_ref,       # (NX, C)
    xref_ref,     # (h, NX, C)
    l_ref,        # (h, NC, C)
    u_ref,        # (h, NC, C)
    U0_ref,       # (h, NU, C)
    z0_ref,       # (h, NC, C)
    y0_ref,       # (h, NC, C)
    Qm_ref,       # (NX, NX) shared diag(Q)
    Reff_ref,     # (NU, NU) shared
    A20_ref,      # (NC, NU) shared cone matrix kron(I4, F)
    U_out,        # (h, NU, C)
    z_out,        # (h, NC, C)
    y_out,        # (h, NC, C)
    *scratch,
    h: int,
    iters: int,
    rho: float,
    over_relax: float,
    ns_it: int,
    lean: bool = False,
    srb_ad: bool = True,
):
    _solve_body(
        Ad_ref[:], Bd_ref[:], lambda k: c_ref[k],
        x0_ref, xref_ref, l_ref, u_ref, U0_ref, z0_ref, y0_ref,
        Qm_ref, Reff_ref, A20_ref,
        U_out, z_out, y_out, scratch,
        h=h, iters=iters, rho=rho, over_relax=over_relax, ns_it=ns_it,
        lean=lean, srb_ad=srb_ad,
    )


def _srb_assemble(Rm, rf, xdrag, fe, *, dt, mass, i_inv_diag):
    """In-kernel SRB linearization + nilpotent-ZOH discretization
    (shared by _kernel_srb and the debug dump kernel): assembles
    (Ad, Bd, c) lane-major from the raw observation quantities.
    Rm (3,3,C), rf (12,C), xdrag (C,), fe (6,C)."""
    C = Rm.shape[-1]
    f32 = jnp.float32
    dt2 = dt * dt / 2.0
    dt3 = dt * dt * dt / 6.0
    RT = _t(Rm, 3, 3)
    zC = jnp.zeros((C,), f32)
    oneC = jnp.ones((C,), f32)

    # I_world^{-1} = R diag(1/I_body) R^T (i_inv_diag is STATIC python
    # floats — an array constant would be a captured const in pallas)
    d0, d1, d2 = (float(v) for v in i_inv_diag)
    Rd = jnp.stack(
        [Rm[:, 0, :] * d0, Rm[:, 1, :] * d1, Rm[:, 2, :] * d2], axis=1
    )                                               # scale columns
    Iinv = _mm(Rd, RT, 3)                           # (3, 3, C)

    # per-foot torque blocks Tb = Iinv @ skew(r_b)
    inv_m = 1.0 / mass
    Tbs = []
    RTTbs = []
    for b in range(4):
        rx, ry, rz = rf[3 * b], rf[3 * b + 1], rf[3 * b + 2]
        skew = jnp.stack([
            jnp.stack([zC, -rz, ry], axis=0),
            jnp.stack([rz, zC, -rx], axis=0),
            jnp.stack([-ry, rx, zC], axis=0),
        ], axis=0)                                   # (3, 3, C)
        Tb = _mm(Iinv, skew, 3)
        Tbs.append(Tb)
        RTTbs.append(_mm(RT, Tb, 3))

    # ---- Adt = I + dt A + dt^2/2 A^2 (A^2: only row 5, cols 9/12) ----
    def e(i, j, extra=None):
        v = oneC if i == j else zC
        if extra is not None:
            v = v + extra
        return v

    rows = []
    for i in range(NX):
        cols = [e(i, j) for j in range(NX)]
        rows.append(cols)
    # A[0:3, 6:9] = R^T
    for i in range(3):
        for j in range(3):
            rows[i][6 + j] = rows[i][6 + j] + dt * RT[i, j]
    rows[3][9] = rows[3][9] + dt * oneC
    rows[4][10] = rows[4][10] + dt * oneC
    rows[5][11] = rows[5][11] + dt * oneC
    rows[11][9] = rows[11][9] + dt * xdrag
    rows[11][12] = rows[11][12] + dt * oneC
    rows[5][9] = rows[5][9] + dt2 * xdrag            # dt^2/2 A^2[5,9]
    rows[5][12] = rows[5][12] + dt2 * oneC           # dt^2/2 A^2[5,12]
    Ad = jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)

    # ---- Bdt = Phi @ B (Phi = dt I + dt^2/2 A + dt^3/6 A^2) ----
    brows = [[zC for _ in range(NU)] for _ in range(NX)]
    for b in range(4):
        c0 = 3 * b
        for i in range(3):
            for j in range(3):
                # rows 0:3: dt^2/2 R^T @ Tb ; rows 6:9: dt Tb
                brows[i][c0 + j] = brows[i][c0 + j] + dt2 * RTTbs[b][i, j]
                brows[6 + i][c0 + j] = brows[6 + i][c0 + j] + dt * Tbs[b][i, j]
        # force rows: 3:6 = dt^2/2 / m (diag per foot), 9:12 = dt/m
        brows[3][c0 + 0] = brows[3][c0 + 0] + dt2 * inv_m * oneC
        brows[4][c0 + 1] = brows[4][c0 + 1] + dt2 * inv_m * oneC
        brows[5][c0 + 2] = brows[5][c0 + 2] + dt2 * inv_m * oneC
        # A^2 row-5 / x-drag couplings
        brows[5][c0 + 0] = brows[5][c0 + 0] + dt3 * inv_m * xdrag
        brows[9][c0 + 0] = brows[9][c0 + 0] + dt * inv_m * oneC
        brows[10][c0 + 1] = brows[10][c0 + 1] + dt * inv_m * oneC
        brows[11][c0 + 2] = brows[11][c0 + 2] + dt * inv_m * oneC
        brows[11][c0 + 0] = brows[11][c0 + 0] + dt2 * inv_m * xdrag
    Bd = jnp.stack([jnp.stack(r, axis=0) for r in brows], axis=0)

    # ---- c = Qdt f_est = Phi[:, 6:12] @ [tau; f] ----
    tau = fe[0:3]
    ff = fe[3:6]
    RTtau = _mv(RT, tau, 3)                          # (3, C)
    c_rows = [zC for _ in range(NX)]
    for i in range(3):
        c_rows[i] = dt2 * RTtau[i]
        c_rows[6 + i] = dt * tau[i]
        c_rows[3 + i] = dt2 * ff[i]
        c_rows[9 + i] = dt * ff[i]
    c_rows[5] = c_rows[5] + dt3 * xdrag * ff[0]
    c_rows[11] = c_rows[11] + dt2 * xdrag * ff[0]
    c_vec = jnp.stack(c_rows, axis=0)                # (NX, C)

    return Ad, Bd, c_vec


def _kernel_srb(
    R_ref,        # (3, 3, C) body->world rotation
    rf_ref,       # (NU, C) r_feet flattened (foot-major xyz)
    xd_ref,       # (1, C) x_drag
    fe_ref,       # (6, C) f_est wrench [tau; f]
    x0_ref, xref_ref, l_ref, u_ref, U0_ref, z0_ref, y0_ref,
    Qm_ref, Reff_ref, A20_ref,
    U_out, z_out, y_out,
    *scratch,
    h: int,
    iters: int,
    rho: float,
    over_relax: float,
    ns_it: int,
    dt: float,
    mass: float,
    i_inv_diag: tuple,
    lean: bool = False,
):
    """Fused problem build: assembles the discrete SRB dynamics
    (Ad, Bd) and the disturbance affine term c IN-KERNEL from the raw
    observation quantities, exploiting the nilpotent closed forms
    (models/srb.py: A^2 has only row 5 nonzero, A^3 = 0 — so
    Adt = I + dt A + dt^2/2 A^2 and Phi = dt I + dt^2/2 A + dt^3/6 A^2
    are direct entry assemblies, no matmul chains).  Replaces the XLA
    build stage's scatter-heavy ct_dynamics + build_prediction (~2 ms
    at batch 2048 — dominated by dispatch/fusion overhead on tiny
    .at[].set chains, not arithmetic)."""
    Ad, Bd, c_vec = _srb_assemble(
        R_ref[:], rf_ref[:], xd_ref[0], fe_ref[:],
        dt=dt, mass=mass, i_inv_diag=i_inv_diag,
    )
    _solve_body(
        Ad, Bd, lambda k: c_vec,
        x0_ref, xref_ref, l_ref, u_ref, U0_ref, z0_ref, y0_ref,
        Qm_ref, Reff_ref, A20_ref,
        U_out, z_out, y_out, scratch,
        h=h, iters=iters, rho=rho, over_relax=over_relax, ns_it=ns_it,
        lean=lean, srb_ad=True,
    )


def _scratch_shapes(h: int, C: int, lean: bool):
    f32 = jnp.float32
    base = [
        pltpu.VMEM((h, NU, NX, C), f32),   # K
        pltpu.VMEM(
            (h, NPACK, C) if lean else (h, NU, NU, C), f32
        ),                                  # Minv (packed when lean)
        pltpu.VMEM((h, NX, C), f32),       # Pc
        pltpu.VMEM((NX, NX, C), f32),      # P carry
        pltpu.VMEM((h, NX, C), f32),       # p_{k+1}
    ]
    if not lean:
        base += [
            pltpu.VMEM((h, NU, C), f32),   # r_lin
            pltpu.VMEM((h, NX, C), f32),   # q_stage (hoisted)
        ]
    return base


@functools.partial(
    jax.jit,
    static_argnames=("iters", "rho", "over_relax", "ns_it", "interpret",
                     "chunk_c", "srb_ad"),
)
def fused_stagewise_solve(
    Ad: jnp.ndarray,        # (B, NX, NX)
    Bd: jnp.ndarray,        # (B, NX, NU)
    c: jnp.ndarray,         # (B, h, NX) or (B, NX)
    x0: jnp.ndarray,        # (B, NX)
    x_ref: jnp.ndarray,     # (B, h, NX)
    Q: jnp.ndarray,         # (NX,)
    R_eff: jnp.ndarray,     # (NU, NU) R + rho kron(I4, F'F)
    F: jnp.ndarray,         # (5, 3)
    l: jnp.ndarray,         # (B, h, NC)
    u: jnp.ndarray,         # (B, h, NC)
    U0: jnp.ndarray,        # (B, h, NU)
    z0: jnp.ndarray,        # (B, h, NC)
    y0: jnp.ndarray,        # (B, h, NC)
    iters: int,
    rho: float,
    over_relax: float = 1.6,
    ns_it: int = 16,
    interpret: bool = False,
    chunk_c: int = 128,
    srb_ad: bool = True,
):
    """Fused stagewise solve.  Returns (U, z, y), each (B, h, ...).

    chunk_c: lane-chunk width (128 or 256 — the 256 variant processes
    two 128-lane vregs per tile op, halving the serial-chain count per
    instance at 2x VMEM; see docs/PERFORMANCE.md lever notes).

    srb_ad (default True): assume Ad/Bd carry the nilpotent SRB ZOH
    sparsity (_N_ROWS/_N_COLS above — true for every problem
    discretize.nilpotent_zoh or build_stagewise produces) and contract
    only the live rows.  Pass False for a general dense Ad."""
    B = x0.shape[0]
    h = x_ref.shape[1]
    C = chunk_c
    f32 = jnp.float32

    if c.ndim == 2:
        c = jnp.broadcast_to(c[:, None, :], (B, h, NX))

    pad = (-B) % C
    if pad:
        padv = lambda t: jnp.concatenate(
            [t, jnp.repeat(t[-1:], pad, axis=0)], axis=0
        )
        Ad, Bd, c, x0, x_ref, l, u, U0, z0, y0 = map(
            padv, (Ad, Bd, c, x0, x_ref, l, u, U0, z0, y0)
        )
    Bp = x0.shape[0]
    nc = Bp // C

    def to_lanes(t):
        extra = t.shape[1:]
        return jnp.moveaxis(
            t.astype(f32).reshape((nc, C) + extra), 1, -1
        )

    Ad_t, Bd_t, c_t, x0_t, xref_t, l_t, u_t, U_t, z_t, y_t = map(
        to_lanes, (Ad, Bd, c, x0, x_ref, l, u, U0, z0, y0)
    )
    Qm = jnp.diag(Q.astype(f32))
    A20 = jnp.kron(jnp.eye(4, dtype=f32), F.astype(f32))      # (20, 12)

    lean = h > 40
    kernel = functools.partial(
        _kernel, h=h, iters=iters, rho=float(rho),
        over_relax=float(over_relax), ns_it=ns_it, lean=lean,
        srb_ad=srb_ad,
    )
    scratch = _scratch_shapes(h, C, lean)

    # VMEM budget: gains + sequences + double-buffered chunk IO.  Above
    # the grid budget, fall back to a grid-less single-buffer call
    # mapped over chunks (same trick as admm_kernel).
    seq_bytes = h * (NX + 2 * NC + NU + 2 * NC + NU + NX) * C * 4
    gain_bytes = h * (NU * 16 + NU * 16 + NX) * C * 4
    single_buffer = gain_bytes + 3 * seq_bytes > 11_000_000

    out_shape_1 = [
        jax.ShapeDtypeStruct((h, NU, C), f32),
        jax.ShapeDtypeStruct((h, NC, C), f32),
        jax.ShapeDtypeStruct((h, NC, C), f32),
    ]
    if single_buffer:
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            in_specs=[vmem] * 13,
            out_specs=[vmem] * 3,
            out_shape=out_shape_1,
            scratch_shapes=scratch,
            interpret=interpret,
        )
        U_o, z_o, y_o = jax.lax.map(
            lambda t: call(*t, Qm, R_eff.astype(f32), A20),
            (Ad_t, Bd_t, c_t, x0_t, xref_t, l_t, u_t, U_t, z_t, y_t),
        )
    else:
        chunk = lambda *shape: pl.BlockSpec(
            (None,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )
        shared = lambda *shape: pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM,
        )
        U_o, z_o, y_o = pl.pallas_call(
            kernel,
            grid=(nc,),
            in_specs=[
                chunk(NX, NX, C), chunk(NX, NU, C), chunk(h, NX, C),
                chunk(NX, C), chunk(h, NX, C), chunk(h, NC, C),
                chunk(h, NC, C), chunk(h, NU, C), chunk(h, NC, C),
                chunk(h, NC, C),
                shared(NX, NX), shared(NU, NU), shared(NC, NU),
            ],
            out_specs=[
                chunk(h, NU, C), chunk(h, NC, C), chunk(h, NC, C),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nc, h, NU, C), f32),
                jax.ShapeDtypeStruct((nc, h, NC, C), f32),
                jax.ShapeDtypeStruct((nc, h, NC, C), f32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(Ad_t, Bd_t, c_t, x0_t, xref_t, l_t, u_t, U_t, z_t, y_t,
          Qm, R_eff.astype(f32), A20)

    def from_lanes(t, inner):
        return jnp.moveaxis(t, -1, 1).reshape((Bp,) + inner)[:B]

    return (
        from_lanes(U_o, (h, NU)),
        from_lanes(z_o, (h, NC)),
        from_lanes(y_o, (h, NC)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("iters", "rho", "over_relax", "ns_it", "dt", "mass",
                     "i_inv_diag", "interpret", "chunk_c"),
)
def fused_stagewise_solve_srb(
    R: jnp.ndarray,         # (B, 3, 3) body->world
    r_feet: jnp.ndarray,    # (B, 4, 3)
    x_drag: jnp.ndarray,    # (B,)
    f_est: jnp.ndarray,     # (B, 6)
    x0: jnp.ndarray,        # (B, NX)
    x_ref: jnp.ndarray,     # (B, h, NX)
    Q: jnp.ndarray,         # (NX,)
    R_eff: jnp.ndarray,     # (NU, NU)
    F: jnp.ndarray,         # (5, 3)
    l: jnp.ndarray,         # (B, h, NC)
    u: jnp.ndarray,         # (B, h, NC)
    U0: jnp.ndarray,
    z0: jnp.ndarray,
    y0: jnp.ndarray,
    iters: int,
    rho: float,
    over_relax: float = 1.6,
    ns_it: int = 16,
    dt: float = 0.026,
    mass: float = 12.0,
    i_inv_diag: tuple = (1 / 0.07, 1 / 0.26, 1 / 0.242),
    interpret: bool = False,
    chunk_c: int = 128,
):
    """Fused-build stagewise solve: the SRB linearization + nilpotent
    ZOH discretization happen IN-KERNEL (see _kernel_srb); the XLA side
    only supplies the raw observation quantities.  Returns (U, z, y)."""
    B = x0.shape[0]
    h = x_ref.shape[1]
    C = chunk_c
    f32 = jnp.float32

    rf = r_feet.reshape(B, NU)
    xd = x_drag.reshape(B, 1)

    pad = (-B) % C
    if pad:
        padv = lambda t: jnp.concatenate(
            [t, jnp.repeat(t[-1:], pad, axis=0)], axis=0
        )
        R, rf, xd, f_est, x0, x_ref, l, u, U0, z0, y0 = map(
            padv, (R, rf, xd, f_est, x0, x_ref, l, u, U0, z0, y0)
        )
    Bp = x0.shape[0]
    nc = Bp // C

    def to_lanes(t):
        extra = t.shape[1:]
        return jnp.moveaxis(t.astype(f32).reshape((nc, C) + extra), 1, -1)

    R_t, rf_t, xd_t, fe_t, x0_t, xref_t, l_t, u_t, U_t, z_t, y_t = map(
        to_lanes, (R, rf, xd, f_est, x0, x_ref, l, u, U0, z0, y0)
    )
    Qm = jnp.diag(Q.astype(f32))
    A20 = jnp.kron(jnp.eye(4, dtype=f32), F.astype(f32))

    lean = h > 40
    kernel = functools.partial(
        _kernel_srb, h=h, iters=iters, rho=float(rho),
        over_relax=float(over_relax), ns_it=ns_it, dt=float(dt),
        mass=float(mass), i_inv_diag=tuple(i_inv_diag), lean=lean,
    )
    scratch = _scratch_shapes(h, C, lean)
    seq_bytes = h * (NX + 2 * NC + NU + 2 * NC + NU) * C * 4
    gain_bytes = h * (NU * 16 + NU * 16 + NX) * C * 4
    single_buffer = gain_bytes + 3 * seq_bytes > 11_000_000

    out_shape_1 = [
        jax.ShapeDtypeStruct((h, NU, C), f32),
        jax.ShapeDtypeStruct((h, NC, C), f32),
        jax.ShapeDtypeStruct((h, NC, C), f32),
    ]
    if single_buffer:
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            in_specs=[vmem] * 14,
            out_specs=[vmem] * 3,
            out_shape=out_shape_1,
            scratch_shapes=scratch,
            interpret=interpret,
        )
        U_o, z_o, y_o = jax.lax.map(
            lambda t: call(*t, Qm, R_eff.astype(f32), A20),
            (R_t, rf_t, xd_t, fe_t, x0_t, xref_t, l_t, u_t, U_t, z_t, y_t),
        )
    else:
        chunk = lambda *shape: pl.BlockSpec(
            (None,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )
        shared = lambda *shape: pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM,
        )
        U_o, z_o, y_o = pl.pallas_call(
            kernel,
            grid=(nc,),
            in_specs=[
                chunk(3, 3, C), chunk(NU, C), chunk(1, C), chunk(6, C),
                chunk(NX, C), chunk(h, NX, C), chunk(h, NC, C),
                chunk(h, NC, C), chunk(h, NU, C), chunk(h, NC, C),
                chunk(h, NC, C),
                shared(NX, NX), shared(NU, NU), shared(NC, NU),
            ],
            out_specs=[
                chunk(h, NU, C), chunk(h, NC, C), chunk(h, NC, C),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nc, h, NU, C), f32),
                jax.ShapeDtypeStruct((nc, h, NC, C), f32),
                jax.ShapeDtypeStruct((nc, h, NC, C), f32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(R_t, rf_t, xd_t, fe_t, x0_t, xref_t, l_t, u_t, U_t, z_t, y_t,
          Qm, R_eff.astype(f32), A20)

    def from_lanes(t, inner):
        return jnp.moveaxis(t, -1, 1).reshape((Bp,) + inner)[:B]

    return (
        from_lanes(U_o, (h, NU)),
        from_lanes(z_o, (h, NC)),
        from_lanes(y_o, (h, NC)),
    )


# ---------------------------------------------------------------------------
# Gains-streaming variant (h > 64): the per-stage gains no longer fit
# VMEM (K alone is ~12.6 MB at h = 128), so the backward Riccati spills
# them to HBM scratch in stage BLOCKS and the ADMM sweeps stream them
# back through double-buffered VMEM slots — per-sweep DMA overlaps the
# previous block's compute (pallas_guide double-buffering pattern).
# This is the capability axis the reference hard-caps at h = 19
# (SolverMPC.cpp:113-116).
# ---------------------------------------------------------------------------

_SB = 8            # stages per streamed block
_NBUF = 2          # double buffer


def _kernel_stream(
    Ad_ref,       # (NX, NX, C)
    Bd_ref,       # (NX, NU, C)
    c_ref,        # (h, NX, C)
    x0_ref,       # (NX, C)
    xref_ref,     # (h, NX, C)
    l_ref,        # (h, NC, C)
    u_ref,        # (h, NC, C)
    U0_ref,       # aliased with U_io (unused name)
    z0_ref,       # aliased with z_io
    y0_ref,       # aliased with y_io
    Qm_ref,       # (NX, NX)
    Reff_ref,     # (NU, NU)
    A20_ref,      # (NC, NU)
    U_io,         # (h, NU, C)  in/out (seeded with warm start)
    z_io,         # (h, NC, C)  in/out
    y_io,         # (h, NC, C)  in/out
    K_hbm,        # (nblk, SB, NU, NX, C)  HBM-resident output (gain spill)
    M_hbm,        # (nblk, SB, NPACK, C)   HBM-resident output
    Pc_scr,       # (h, NX, C)
    P_scr,        # (NX, NX, C)
    p_scr,        # (h, NX, C)
    Kbuf,         # (NBUF, SB, NU, NX, C)  VMEM
    Mbuf,         # (NBUF, SB, NPACK, C)   VMEM
    sem_kw, sem_mw, sem_kr, sem_mr,        # DMA sems (NBUF,) each
    *,
    h: int,
    iters: int,
    rho: float,
    over_relax: float,
    ns_it: int,
    srb_ad: bool = True,
):
    del U0_ref, z0_ref, y0_ref
    C = Ad_ref.shape[-1]
    f32 = jnp.float32
    nblk = h // _SB
    Ad = Ad_ref[:]
    Bd = Bd_ref[:]
    AdT = _t(Ad, NX, NX)
    BdT = _t(Bd, NX, NU)
    Qm = Qm_ref[:][:, :, None]
    Reff = Reff_ref[:][:, :, None]
    A20 = A20_ref[:]
    hp = jax.lax.Precision.HIGHEST
    mv_A, mv_AT, mm_r_A, mm_l_AT, nbd = _ad_ops(Ad, AdT, srb_ad)

    P_scr[:] = jnp.broadcast_to(Qm, (NX, NX, C)).astype(f32)
    eyeu = jax.lax.broadcasted_iota(jnp.int32, (NU, NU), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (NU, NU), 1)
    eyeu = jnp.where(eyeu, 1.0, 0.0).astype(f32)[:, :, None]
    ns_warm = max(ns_it * 3 // 8, 6)
    Qd = jnp.stack([Qm[i, i, :] for i in range(NX)], axis=0)   # (NX, 1)

    def k_write_dma(ws, b):
        return pltpu.make_async_copy(Kbuf.at[ws], K_hbm.at[b], sem_kw.at[ws])

    def m_write_dma(ws, b):
        return pltpu.make_async_copy(Mbuf.at[ws], M_hbm.at[b], sem_mw.at[ws])

    def k_read_dma(rs, b):
        return pltpu.make_async_copy(K_hbm.at[b], Kbuf.at[rs], sem_kr.at[rs])

    def m_read_dma(rs, b):
        return pltpu.make_async_copy(M_hbm.at[b], Mbuf.at[rs], sem_mr.at[rs])

    # ---- factorize: backward Riccati, gains spilled per block ----
    def backward_block(bb, X_carry):
        ws = bb % _NBUF
        b = nblk - 1 - bb

        @pl.when(bb >= _NBUF)
        def _():
            b_old = nblk - 1 - (bb - _NBUF)
            k_write_dma(ws, b_old).wait()
            m_write_dma(ws, b_old).wait()

        def stage(ss, X_prev):
            lo = _SB - 1 - ss
            k = b * _SB + lo
            P = P_scr[:]
            BtP = _mm(BdT, P, nbd)
            Quu = Reff + _mm(BtP, Bd, nbd)
            first = (bb == 0) & (ss == 0)
            Minv = _stage_quu_inverse(
                Quu, X_prev, first, eyeu, C, ns_it, ns_warm
            )
            Qux = mm_r_A(BtP)
            K = _mm(Minv, Qux, NU)
            Kbuf[ws, lo] = K
            Mbuf[ws, lo] = _pack_sym(Minv)
            Pc_scr[k] = _mv(P, c_ref[k], NX)
            AtP = mm_l_AT(P)
            P_new = Qm + mm_r_A(AtP) - _mm(_t(Qux, NU, NX), K, NU)
            P_new = (P_new + _t(P_new, NX, NX)) / 2.0
            P_scr[:] = P_new
            return Minv

        X = jax.lax.fori_loop(0, _SB, stage, X_carry)
        k_write_dma(ws, b).start()
        m_write_dma(ws, b).start()
        return X

    jax.lax.fori_loop(
        0, nblk, backward_block, jnp.zeros((NU, NU, C), f32)
    )
    # drain the last NBUF block writes
    for t in range(_NBUF):
        bb = nblk - _NBUF + t
        if bb < 0:
            continue
        k_write_dma(bb % _NBUF, nblk - 1 - bb).wait()
        m_write_dma(bb % _NBUF, nblk - 1 - bb).wait()

    # ---- ADMM iterations with streamed gains ----
    a = over_relax
    rho_inv = 1.0 / rho
    A20T = A20.T
    qT = -(Qd * xref_ref[h - 1])

    def iteration(_, carry):
        # backward costate sweep: blocks descending, K streamed
        k_read_dma(0, nblk - 1).start()

        def bwd_block(bb, p):
            rs = bb % _NBUF
            blk = nblk - 1 - bb

            @pl.when(bb + 1 < nblk)
            def _():
                k_read_dma((bb + 1) % _NBUF, blk - 1).start()

            k_read_dma(rs, blk).wait()

            def stage(ss, p):
                lo = _SB - 1 - ss
                k = blk * _SB + lo
                w = rho * z_io[k] - y_io[k]
                rk = jnp.dot(
                    A20T, w, preferred_element_type=f32, precision=hp
                )
                K = Kbuf[rs, lo]
                # merged K' matvecs + v = Pc + p stored for fwd
                # (see the resident kernel's bwd)
                v = Pc_scr[k] + p
                p_scr[k] = v
                km1 = jnp.maximum(k - 1, 0)
                qs = -(Qd * xref_ref[km1])
                qk = jnp.where(k >= 1, qs, jnp.zeros_like(qs))
                return qk + mv_AT(v) - _tmv(
                    K, _mv(BdT, v, nbd)[:NU] - rk, NU
                )

            return jax.lax.fori_loop(0, _SB, stage, p)

        jax.lax.fori_loop(0, nblk, bwd_block, qT)

        # forward rollout: blocks ascending, K + Minv streamed
        k_read_dma(0, 0).start()
        m_read_dma(0, 0).start()

        def fwd_block(blk, x):
            rs = blk % _NBUF

            @pl.when(blk + 1 < nblk)
            def _():
                k_read_dma((blk + 1) % _NBUF, blk + 1).start()
                m_read_dma((blk + 1) % _NBUF, blk + 1).start()

            k_read_dma(rs, blk).wait()
            m_read_dma(rs, blk).wait()

            def stage(lo, x):
                k = blk * _SB + lo
                K = Kbuf[rs, lo]
                w = rho * z_io[k] - y_io[k]
                rk = jnp.dot(
                    A20T, w, preferred_element_type=f32, precision=hp
                )
                Minv_k = _unpack_sym(Mbuf[rs, lo])
                BtPp = _mv(BdT, p_scr[k], nbd)      # p_scr holds Pc + p
                kff = _mv(Minv_k, BtPp - rk, NU)
                u_t = -_mv(K, x, NX) - kff
                x_new = mv_A(x) + _mv(Bd, u_t, NU) + c_ref[k]
                Fu_t = jnp.dot(
                    A20, u_t, preferred_element_type=f32, precision=hp
                )
                z = z_io[k]
                y = y_io[k]
                U_io[k] = a * u_t + (1.0 - a) * U_io[k]
                Fu_r = a * Fu_t + (1.0 - a) * z
                z_new = jnp.clip(Fu_r + rho_inv * y, l_ref[k], u_ref[k])
                z_io[k] = z_new
                y_io[k] = y + rho * (Fu_r - z_new)
                return x_new

            return jax.lax.fori_loop(0, _SB, stage, x)

        jax.lax.fori_loop(0, nblk, fwd_block, x0_ref[:])
        return carry

    jax.lax.fori_loop(0, iters, iteration, 0)


@functools.partial(
    jax.jit,
    static_argnames=("iters", "rho", "over_relax", "ns_it", "interpret"),
)
def fused_stagewise_solve_stream(
    Ad: jnp.ndarray,        # (B, NX, NX)
    Bd: jnp.ndarray,        # (B, NX, NU)
    c: jnp.ndarray,         # (B, h, NX) or (B, NX)
    x0: jnp.ndarray,        # (B, NX)
    x_ref: jnp.ndarray,     # (B, h, NX)
    Q: jnp.ndarray,         # (NX,)
    R_eff: jnp.ndarray,     # (NU, NU)
    F: jnp.ndarray,         # (5, 3)
    l: jnp.ndarray,         # (B, h, NC)
    u: jnp.ndarray,         # (B, h, NC)
    U0: jnp.ndarray,
    z0: jnp.ndarray,
    y0: jnp.ndarray,
    iters: int,
    rho: float,
    over_relax: float = 1.6,
    ns_it: int = 16,
    interpret: bool = False,
):
    """Gains-streaming stagewise solve for h in (64, 128].  Returns
    (U, z, y).  Requires h % 8 == 0 (stage-block granularity)."""
    B = x0.shape[0]
    h = x_ref.shape[1]
    assert h % _SB == 0, "stream kernel needs h % 8 == 0"
    C = 128
    f32 = jnp.float32
    nblk = h // _SB

    if c.ndim == 2:
        c = jnp.broadcast_to(c[:, None, :], (B, h, NX))

    pad = (-B) % C
    if pad:
        padv = lambda t: jnp.concatenate(
            [t, jnp.repeat(t[-1:], pad, axis=0)], axis=0
        )
        Ad, Bd, c, x0, x_ref, l, u, U0, z0, y0 = map(
            padv, (Ad, Bd, c, x0, x_ref, l, u, U0, z0, y0)
        )
    Bp = x0.shape[0]
    nc = Bp // C

    def to_lanes(t):
        extra = t.shape[1:]
        return jnp.moveaxis(
            t.astype(f32).reshape((nc, C) + extra), 1, -1
        )

    Ad_t, Bd_t, c_t, x0_t, xref_t, l_t, u_t, U_t, z_t, y_t = map(
        to_lanes, (Ad, Bd, c, x0, x_ref, l, u, U0, z0, y0)
    )
    Qm = jnp.diag(Q.astype(f32))
    A20 = jnp.kron(jnp.eye(4, dtype=f32), F.astype(f32))

    kernel = functools.partial(
        _kernel_stream, h=h, iters=iters, rho=float(rho),
        over_relax=float(over_relax), ns_it=ns_it,
    )
    # Mosaic restricts scratch allocation to VMEM/SMEM/semaphores, so
    # the HBM gain-spill buffers ride as HBM-memory-space OUTPUTS (the
    # kernel DMAs into/out of them and the caller discards them)
    scratch = [
        pltpu.VMEM((h, NX, C), f32),               # Pc
        pltpu.VMEM((NX, NX, C), f32),              # P carry
        pltpu.VMEM((h, NX, C), f32),               # p costate
        pltpu.VMEM((_NBUF, _SB, NU, NX, C), f32),  # K double buffer
        pltpu.VMEM((_NBUF, _SB, NPACK, C), f32),   # Minv double buffer
        pltpu.SemaphoreType.DMA((_NBUF,)),
        pltpu.SemaphoreType.DMA((_NBUF,)),
        pltpu.SemaphoreType.DMA((_NBUF,)),
        pltpu.SemaphoreType.DMA((_NBUF,)),
    ]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    call = pl.pallas_call(
        kernel,
        in_specs=[vmem] * 13,
        out_specs=[vmem, vmem, vmem, hbm, hbm],
        out_shape=[
            jax.ShapeDtypeStruct((h, NU, C), f32),
            jax.ShapeDtypeStruct((h, NC, C), f32),
            jax.ShapeDtypeStruct((h, NC, C), f32),
            jax.ShapeDtypeStruct((nblk, _SB, NU, NX, C), f32),
            jax.ShapeDtypeStruct((nblk, _SB, NPACK, C), f32),
        ],
        # warm-start carries ARE the outputs: alias to skip both the
        # seed copy and 3 x (h, NC, C) of VMEM
        input_output_aliases={7: 0, 8: 1, 9: 2},
        scratch_shapes=scratch,
        interpret=interpret,
    )
    U_o, z_o, y_o, _, _ = jax.lax.map(
        lambda t: call(*t, Qm, R_eff.astype(f32), A20),
        (Ad_t, Bd_t, c_t, x0_t, xref_t, l_t, u_t, U_t, z_t, y_t),
    )

    def from_lanes(t, inner):
        return jnp.moveaxis(t, -1, 1).reshape((Bp,) + inner)[:B]

    return (
        from_lanes(U_o, (h, NU)),
        from_lanes(z_o, (h, NC)),
        from_lanes(y_o, (h, NC)),
    )


def _kernel_srb_dump(R_ref, rf_ref, xd_ref, fe_ref, Ad_out, Bd_out, c_out,
                     *, dt, mass, i_inv_diag):
    Ad, Bd, c_vec = _srb_assemble(
        R_ref[:], rf_ref[:], xd_ref[0], fe_ref[:],
        dt=dt, mass=mass, i_inv_diag=i_inv_diag,
    )
    Ad_out[:] = Ad
    Bd_out[:] = Bd
    c_out[:] = c_vec


@functools.partial(
    jax.jit,
    static_argnames=("dt", "mass", "i_inv_diag", "interpret"),
)
def srb_build_dump(
    R: jnp.ndarray,         # (B, 3, 3)
    r_feet: jnp.ndarray,    # (B, 4, 3)
    x_drag: jnp.ndarray,    # (B,)
    f_est: jnp.ndarray,     # (B, 6)
    dt: float = 0.026,
    mass: float = 12.0,
    i_inv_diag: tuple = (1 / 0.07, 1 / 0.26, 1 / 0.242),
    interpret: bool = False,
):
    """Materialize the IN-KERNEL SRB build (audit hook): returns
    (Ad (B,13,13), Bd (B,13,12), c (B,13)) exactly as _kernel_srb
    assembles them — lets tests/probes diff the fused build against the
    XLA build on real hardware."""
    B = x_drag.shape[0]
    C = 128
    f32 = jnp.float32
    rf = r_feet.reshape(B, NU)
    xd = x_drag.reshape(B, 1)
    pad = (-B) % C
    args = (R, rf, xd, f_est)
    if pad:
        padv = lambda t: jnp.concatenate(
            [t, jnp.repeat(t[-1:], pad, axis=0)], axis=0
        )
        args = tuple(map(padv, args))
    Bp = args[1].shape[0]
    nc = Bp // C

    def to_lanes(t):
        extra = t.shape[1:]
        return jnp.moveaxis(t.astype(f32).reshape((nc, C) + extra), 1, -1)

    lanes = tuple(map(to_lanes, args))
    kernel = functools.partial(
        _kernel_srb_dump, dt=float(dt), mass=float(mass),
        i_inv_diag=tuple(i_inv_diag),
    )
    chunk = lambda *shape: pl.BlockSpec(
        (None,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    Ad_o, Bd_o, c_o = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[chunk(3, 3, C), chunk(NU, C), chunk(1, C), chunk(6, C)],
        out_specs=[chunk(NX, NX, C), chunk(NX, NU, C), chunk(NX, C)],
        out_shape=[
            jax.ShapeDtypeStruct((nc, NX, NX, C), f32),
            jax.ShapeDtypeStruct((nc, NX, NU, C), f32),
            jax.ShapeDtypeStruct((nc, NX, C), f32),
        ],
        interpret=interpret,
    )(*lanes)

    unl = lambda t, inner: jnp.moveaxis(t, -1, 1).reshape((Bp,) + inner)[:B]
    return unl(Ad_o, (NX, NX)), unl(Bd_o, (NX, NU)), unl(c_o, (NX,))
