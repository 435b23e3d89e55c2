"""Fused whole-body-control Pallas kernel (KinWBC + WBIC + cone PDIP).

The XLA WBC tier (control/wbc.py) is the dominant cost of the composed
500 Hz tick: the contact-null-space pinv cascade (KinWBC.cpp:16-90) and
the dynamically consistent WBIC cascade + relaxation QP (WBIC.cpp:17-261)
compile to hundreds of tiny (18x18 / 12x12 / 3x3) batched ops whose
dispatch + HBM round-trips cost ~5.2 ms at batch 256 — ~20x the
arithmetic.  This kernel fuses the ENTIRE WBC solve per 128-lane batch
chunk with everything VMEM-resident, using the same lane-major toolkit
as ops/pallas/stagewise_kernel.py:

- instances ride the LANE axis (chunk C = 128); every block matmul /
  matvec is an unrolled sum of row-broadcast multiplies (the 18x18
  blocks are far below the MXU tile — VPU territory);
- SPD inverses are exact recursive 2x2-block Schur complements on a
  3x3 adjugate base (the lane-major analog of linalg.spd_inverse) —
  short tile-op chains; an unrolled scalar Cholesky variant measured
  ~5x slower in-kernel (long serial (C,)-wide dependency chains);
- null-space projector updates use the rank-3 form
  N <- N - (N J^+)(J N) instead of the full 18x18 @ 18x18 product;
- the WBIC relaxation QP runs the same fixed-iteration primal-dual IPM
  as ops/qp_pdip.py (fraction-to-boundary, mu floor, NaN freeze),
  specialized to the 12-var / 24-cone-row structure with per-iteration
  Schur-inverse KKT solves (+ one refinement step) in VMEM.

Stance/swing task masking (the TPU-first reformulation of the
reference's shape-dynamic task lists, control/wbc.py docstring) flows
through unchanged: zero task rows vanish from the damped pinvs exactly.

Outputs match the XLA path (wbc.run) to f32 tolerance
(tests/test_wbc_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ND = 18          # generalized dofs
NJ = 12          # actuated joints
NT = 6           # tasks: [ori, pos, foot0..3]
NCON = 24        # cone rows: 4 legs x 6


def _mm(a, b, n_k):
    """Lane matmul: (r, k, C) x (k, s, C) -> (r, s, C)."""
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
    """Transposed lane matvec: (r, k, C) x (r, C) -> (k, C)."""
    acc = a[0] * v[0][None, :]
    for r in range(1, n_r):
        acc = acc + a[r] * v[r][None, :]
    return acc


def _t(a, r, c):
    """Lane transpose (r, c, C) -> (c, r, C)."""
    return jnp.stack([a[:, j, :] for j in range(c)], axis=0)


def _eye(n, C):
    m = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.broadcast_to(
        jnp.where(m, 1.0, 0.0).astype(jnp.float32)[:, :, None], (n, n, C)
    )


def _inv3(M, reg):
    """Closed-form adjugate inverse of (3, 3, C) SPD + reg I."""
    a = M[0, 0] + reg
    b = M[0, 1]
    c = M[0, 2]
    d = M[1, 1] + reg
    e = M[1, 2]
    f = M[2, 2] + reg
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    inv_det = 1.0 / det
    row0 = jnp.stack([co00, co01, co02], axis=0) * inv_det
    row1 = jnp.stack([co01, co11, co12], axis=0) * inv_det
    row2 = jnp.stack([co02, co12, co22], axis=0) * inv_det
    return jnp.stack([row0, row1, row2], axis=0)


def _add_diag(M, n, reg):
    """M + reg I for (n, n, C) — iota mask (Mosaic rejects the zero-size
    row slices a concatenate-based build would need at i = 0)."""
    if not reg:
        return M
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = jnp.where(ii == jj, 1.0, 0.0).astype(M.dtype)[:, :, None]
    return M + reg * eye


def _spd_inv(M, n, reg=0.0):
    """Exact inverse of (n, n, C) SPD + reg I via recursive 2x2-block
    Schur complements on a 3x3 Cramer base — the lane-major analog of
    linalg.spd_inverse.  Short tile-op dependency chains (the unrolled
    scalar Cholesky measured ~5x slower in-kernel: ~600 serial
    (C,)-wide ops vs ~40 (h, h, C) tile ops here)."""
    if reg:
        M = _add_diag(M, n, float(reg))
    return _spd_inv_rec(M, n)


def _spd_inv_rec(M, n):
    if n == 1:
        return 1.0 / M
    if n == 2:
        a, b, d = M[0, 0], M[0, 1], M[1, 1]
        inv_det = 1.0 / (a * d - b * b)
        r0 = jnp.stack([d, -b], axis=0) * inv_det
        r1 = jnp.stack([-b, a], axis=0) * inv_det
        return jnp.stack([r0, r1], axis=0)
    if n == 3:
        return _inv3(M, 0.0)
    # split (n+1)//2 exactly as linalg.spd_inverse: the elimination
    # order matters numerically — on the KF's trust-transient S (cond
    # ~5e5) the n//2 split at n=7 (3,4 vs 4,3) measured 200x worse
    # inverse error in f32
    h = (n + 1) // 2
    A = M[0:h, 0:h]
    B = M[0:h, h:n]
    D = M[h:n, h:n]
    Ai = _spd_inv_rec(A, h)
    AiB = _mm(Ai, B, h)                      # (h, n-h, C)
    S = D - _mm(_t(B, h, n - h), AiB, h)     # Schur complement
    Si = _spd_inv_rec(S, n - h)
    TR = -_mm(AiB, Si, n - h)                # (h, n-h, C)
    TL = Ai - _mm(TR, _t(AiB, h, n - h), n - h)
    rows_top = jnp.concatenate([TL, TR], axis=1)
    rows_bot = jnp.concatenate([_t(TR, h, n - h), Si], axis=1)
    return jnp.concatenate([rows_top, rows_bot], axis=0)


def _spd_solve(M, rhs, n, reg):
    """(M + reg I) \\ rhs via explicit Schur inverse + one iterative-
    refinement step (mirrors qp_pdip._kkt_solve kkt="spd")."""
    Mr = _add_diag(M, n, float(reg)) if reg else M
    Mi = _spd_inv_rec(Mr, n)
    x = _mv(Mi, rhs, n)
    r = rhs - _mv(Mr, x, n)
    return x + _mv(Mi, r, n)


def _cone_rows(mu):
    """Static 6x3 WBIC friction block Uf (SingleContact.cpp:17-29)."""
    return (
        (0.0, 0.0, 1.0),
        (1.0, 0.0, mu),
        (-1.0, 0.0, mu),
        (0.0, 1.0, mu),
        (0.0, -1.0, mu),
        (0.0, 0.0, -1.0),
    )


def _cone_apply(uf, x):
    """blockdiag(Uf x4) @ x: (12, C) -> (24, C) with static Uf rows."""
    out = []
    for leg in range(4):
        fx, fy, fz = x[3 * leg], x[3 * leg + 1], x[3 * leg + 2]
        for (cx, cy, cz) in uf:
            r = fz * cz
            if cx:
                r = r + fx * cx
            if cy:
                r = r + fy * cy
            out.append(r)
    return jnp.stack(out, axis=0)


def _cone_apply_T(uf, v):
    """blockdiag(Uf x4)^T @ v: (24, C) -> (12, C)."""
    out = []
    for leg in range(4):
        rows = [v[6 * leg + i] for i in range(6)]
        for c_idx in range(3):
            acc = None
            for i, coef in enumerate(r[c_idx] for r in uf):
                if coef:
                    term = rows[i] * coef if coef != 1.0 else rows[i]
                    acc = term if acc is None else acc + term
            out.append(acc)
    return jnp.stack(out, axis=0)


def _min_over_rows(v, n):
    acc = v[0]
    for i in range(1, n):
        acc = jnp.minimum(acc, v[i])
    return acc


def _kernel(
    A_ref,        # (ND, ND, C) mass matrix
    Ainv_ref,     # (ND, ND, C)
    bvec_ref,     # (ND, C) cori + grav
    Jc_ref,       # (NJ, ND, C) UNMASKED point-contact jacobian rows
    Jcdqd_ref,    # (NJ, C) unmasked
    cmask_ref,    # (4, C) stance mask (1.0 stance / 0.0 swing)
    R_ref,        # (3, 3, C) body->world rotation
    err_ref,      # (ND, C) kin task errors [ori, pos, foot0..3] PRE-MASKED
    vel_ref,      # (ND, C) task desired velocities, pre-masked
    cmd_ref,      # (ND, C) task accel commands, pre-masked
    jdqd_ref,     # (ND, C) task Jdot qdot terms, pre-masked
    frdes_ref,    # (NJ, C) MPC reaction forces, pre-masked
    q_ref,        # (NJ, C) measured joint positions
    jpos_out,     # (NJ, C)
    jvel_out,     # (NJ, C)
    tau_out,      # (NJ, C)
    fr_out,       # (NJ, C)
    *,
    damping: float,
    w_floating: float,
    w_rf: float,
    mu: float,
    max_fz: float,
    pdip_iters: int,
    pdip_reg: float,
    pdip_tau: float,
    pdip_mu_min: float,
    pdip_slack_floor: float,
    pdip_big_clamp: float,
):
    C = A_ref.shape[-1]
    f32 = jnp.float32
    lam = float(damping)
    A = A_ref[:]
    Ainv = Ainv_ref[:]
    bvec = bvec_ref[:]
    R = R_ref[:]
    cmask = cmask_ref[:]
    smask = 1.0 - cmask
    Jc = Jc_ref[:]
    # stance-masked contact jacobian (rows of swing feet zeroed)
    Jc_m = jnp.concatenate(
        [Jc[3 * k:3 * k + 3] * cmask[k][None, None, :] for k in range(4)],
        axis=0,
    )
    Jcdqd_m = jnp.concatenate(
        [Jcdqd_ref[3 * k:3 * k + 3] * cmask[k][None, :] for k in range(4)],
        axis=0,
    )
    fr_des = frdes_ref[:]
    err = err_ref[:]
    vel = vel_ref[:]
    cmd = cmd_ref[:]
    jdqd = jdqd_ref[:]

    JcT = _t(Jc_m, NJ, ND)                       # (ND, NJ, C)

    # swing-masked foot task jacobians (J_feet = Jc * swing)
    def foot_J(k):
        return Jc[3 * k:3 * k + 3] * smask[k][None, None, :]

    # task row extraction: J_ori @ M = R @ M[0:3], J_pos @ M = R @ M[3:6]
    def task_apply(i, Mat):
        """J_i @ Mat for (ND, s, C) Mat -> (3, s, C)."""
        if i == 0:
            return _mm(R, Mat[0:3], 3)
        if i == 1:
            return _mm(R, Mat[3:6], 3)
        return _mm(foot_J(i - 2), Mat, ND)

    def task_mv(i, v):
        """J_i @ v for (ND, C) v -> (3, C)."""
        if i == 0:
            return _mv(R, v[0:3], 3)
        if i == 1:
            return _mv(R, v[3:6], 3)
        return _mv(foot_J(i - 2), v, ND)

    # ---------------- KinWBC (KinWBC.cpp:16-90) ----------------
    JJt = _mm(Jc_m, JcT, ND)                     # (NJ, NJ, C)
    JJt_inv = _spd_inv(JJt, NJ, lam)
    Jc_pinv = _mm(JcT, JJt_inv, NJ)              # (ND, NJ, C)
    Nc = _eye(ND, C) - _mm(Jc_pinv, Jc_m, NJ)    # (ND, ND, C)

    N = Nc
    delta_q = jnp.zeros((ND, C), f32)
    qdot = jnp.zeros((ND, C), f32)
    for i in range(NT):
        JtPre = task_apply(i, N)                 # (3, ND, C)
        JtPreT = _t(JtPre, 3, ND)                # (ND, 3, C)
        G3 = _mm(JtPre, JtPreT, ND)              # (3, 3, C)
        G3i = _inv3(G3, lam)
        pinv = _mm(JtPreT, G3i, 3)               # (ND, 3, C)
        e_i = err[3 * i:3 * i + 3]
        v_i = vel[3 * i:3 * i + 3]
        if i == 0:
            delta_q = _mv(pinv, e_i, 3)
            qdot = _mv(pinv, v_i, 3)
        else:
            delta_q = delta_q + _mv(pinv, e_i - task_mv(i, delta_q), 3)
            qdot = qdot + _mv(pinv, v_i - task_mv(i, qdot), 3)
        # N <- N (I - pinv JtPre) = N - (N pinv)(JtPre)   (rank-3 update)
        if i == 0:
            # reference order: N_pre = Nc (I - JtPre_pinv JtPre)
            N = Nc - _mm(_mm(Nc, pinv, ND), JtPre, 3)
        elif i < NT - 1:                         # last task's N is dead
            N = N - _mm(_mm(N, pinv, ND), JtPre, 3)

    jpos_out[:] = q_ref[:] + delta_q[6:ND]
    jvel_out[:] = qdot[6:ND]

    # ---------------- WBIC cascade (WBIC.cpp:17-90) ----------------
    AiJt = _mm(Ainv, JcT, ND)                    # (ND, NJ, C)
    JAiJt = _mm(Jc_m, AiJt, ND)                  # (NJ, NJ, C)
    JcBar = _mm(AiJt, _spd_inv(JAiJt, NJ, lam), NJ)   # (ND, NJ, C)
    qddot = _mv(JcBar, -Jcdqd_m, NJ)
    Npre = _eye(ND, C) - _mm(JcBar, Jc_m, NJ)
    for i in range(NT):
        JtPre = task_apply(i, Npre)
        JtPreT = _t(JtPre, 3, ND)
        AiJt3 = _mm(Ainv, JtPreT, ND)            # (ND, 3, C)
        G3 = _mm(JtPre, AiJt3, ND)               # (3, 3, C)
        JtBar = _mm(AiJt3, _inv3(G3, lam), 3)    # (ND, 3, C)
        rhs = (
            cmd[3 * i:3 * i + 3] - jdqd[3 * i:3 * i + 3]
            - task_mv(i, qddot)
        )
        qddot = qddot + _mv(JtBar, rhs, 3)
        if i < NT - 1:
            Npre = Npre - _mm(_mm(Npre, JtBar, ND), JtPre, 3)

    # ---------------- relaxation QP (WBIC.cpp:91-261) ----------------
    # eliminate z_f = A_ff^{-1}(resid + Jc_f^T dF); PDIP on dF (12 vars,
    # 24 cone rows)
    resid_full = _mv(A, qddot, ND) + bvec - _mv(JcT, fr_des, NJ)
    resid = -resid_full[0:6]                     # (6, C)
    A_ff = A[0:6, 0:6]
    A_ff_inv = _spd_inv(A_ff, 6)
    z0 = _mv(A_ff_inv, resid, 6)
    JcfT = JcT[0:6]                              # (6, NJ, C)
    Mmat = _mm(A_ff_inv, JcfT, 6)                # (6, NJ, C)
    MmatT = _t(Mmat, 6, NJ)                      # (NJ, 6, C)
    wf = float(w_floating)
    wrf = float(w_rf)
    P = 2.0 * wf * _mm(MmatT, Mmat, 6) + (2.0 * wrf) * _eye(NJ, C)
    q_lin = 2.0 * wf * _mv(MmatT, z0, 6)

    uf = _cone_rows(float(mu))
    # l = ieq - Uf fr_des with ieq = rows of zeros except row 5 = -fz_max
    fz_max = float(max_fz) * cmask                 # (4, C)
    uf_frdes = _cone_apply(uf, fr_des)           # (24, C)
    l_rows = []
    for leg in range(4):
        for i in range(6):
            base = -fz_max[leg] if i == 5 else jnp.zeros((C,), f32)
            l_rows.append(base - uf_frdes[6 * leg + i])
    l = jnp.stack(l_rows, axis=0)                # (24, C)
    u = jnp.full((NCON, C), float(pdip_big_clamp), f32)
    # open degenerate l == u rows (qp_pdip.solve preamble)
    u = jnp.where(u - l < 1e-6, l + 1e-6, u)

    tau_fb = float(pdip_tau)
    mu_min = float(pdip_mu_min)
    floor = float(pdip_slack_floor)
    reg = float(pdip_reg)

    def max_step(v, dv):
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        return jnp.minimum(1.0, tau_fb * _min_over_rows(ratio, NCON))

    def pdip_body(_, carry):
        x, sl, su, zl, zu = carry
        sl = jnp.maximum(sl, floor)
        su = jnp.maximum(su, floor)
        zl = jnp.maximum(zl, floor)
        zu = jnp.maximum(zu, floor)
        ax = _cone_apply(uf, x)
        r_dual = _mv(P, x, NJ) + q_lin - _cone_apply_T(uf, zl - zu)
        r_pl = sl - (ax - l)
        r_pu = su - (u - ax)
        mu_c = (_sum_rows(sl * zl) + _sum_rows(su * zu)) / (2.0 * NCON)
        mu_t = jnp.maximum(0.1 * mu_c, mu_min)
        r_cl = sl * zl - mu_t[None, :]
        r_cu = su * zu - mu_t[None, :]
        d = zl / sl + zu / su                    # (24, C)
        rhs = (
            -r_dual
            - _cone_apply_T(uf, (r_cl - zl * r_pl) / sl)
            + _cone_apply_T(uf, (r_cu - zu * r_pu) / su)
        )
        # K = P + reg I + blockdiag(Uf' diag(d_leg) Uf)
        Kr = [[P[i, j] for j in range(NJ)] for i in range(NJ)]
        for leg in range(4):
            dl = [d[6 * leg + i] for i in range(6)]
            for a_ in range(3):
                for b_ in range(3):
                    s = None
                    for i, row in enumerate(uf):
                        if row[a_] and row[b_]:
                            term = dl[i] * (row[a_] * row[b_])
                            s = term if s is None else s + term
                    if s is not None:
                        ia, ib = 3 * leg + a_, 3 * leg + b_
                        Kr[ia][ib] = Kr[ia][ib] + s
        K = jnp.stack([jnp.stack(r_, axis=0) for r_ in Kr], axis=0)
        dx = _spd_solve(K, rhs, NJ, reg)
        adx = _cone_apply(uf, dx)
        dsl = adx - r_pl
        dsu = -adx - r_pu
        dzl = -(r_cl + zl * dsl) / sl
        dzu = -(r_cu + zu * dsu) / su
        a_step = jnp.minimum(
            jnp.minimum(max_step(sl, dsl), max_step(su, dsu)),
            jnp.minimum(max_step(zl, dzl), max_step(zu, dzu)),
        )[None, :]
        finite = (
            _all_rows_finite(dx, NJ)
            & _all_rows_finite(dsl, NCON)
            & _all_rows_finite(dsu, NCON)
            & _all_rows_finite(dzl, NCON)
            & _all_rows_finite(dzu, NCON)
        )[None, :]
        a_step = jnp.where(finite, a_step, 0.0)
        zf = jnp.zeros_like(a_step)
        dx = jnp.where(finite, dx, zf)
        dsl = jnp.where(finite, dsl, zf)
        dsu = jnp.where(finite, dsu, zf)
        dzl = jnp.where(finite, dzl, zf)
        dzu = jnp.where(finite, dzu, zf)
        return (
            x + a_step * dx,
            sl + a_step * dsl,
            su + a_step * dsu,
            zl + a_step * dzl,
            zu + a_step * dzu,
        )

    ones = jnp.ones((NCON, C), f32)
    x0 = jnp.zeros((NJ, C), f32)
    dF, _, _, _, _ = jax.lax.fori_loop(
        0, pdip_iters, pdip_body, (x0, ones, ones, ones, ones)
    )

    fr = fr_des + dF
    z_f = z0 + _mv(Mmat, dF, NJ)
    qddot_final = jnp.concatenate([qddot[0:6] + z_f, qddot[6:ND]], axis=0)
    tau_full = _mv(A, qddot_final, ND) + bvec - _mv(JcT, fr, NJ)
    tau_out[:] = tau_full[6:ND]
    fr_out[:] = fr


def _sum_rows(v):
    acc = v[0]
    for i in range(1, v.shape[0]):
        acc = acc + v[i]
    return acc


def _all_rows_finite(v, n):
    acc = jnp.isfinite(v[0])
    for i in range(1, n):
        acc = acc & jnp.isfinite(v[i])
    return acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "damping", "w_floating", "w_rf", "mu", "max_fz", "pdip_iters",
        "pdip_reg", "pdip_tau", "pdip_mu_min", "pdip_slack_floor",
        "pdip_big_clamp", "interpret",
    ),
)
def fused_wbc(
    A: jnp.ndarray,          # (B, ND, ND)
    Ainv: jnp.ndarray,       # (B, ND, ND)
    bvec: jnp.ndarray,       # (B, ND)
    Jc: jnp.ndarray,         # (B, NJ, ND) unmasked
    Jcdqd: jnp.ndarray,      # (B, NJ)
    cmask: jnp.ndarray,      # (B, 4)
    R: jnp.ndarray,          # (B, 3, 3)
    err: jnp.ndarray,        # (B, ND)
    vel: jnp.ndarray,        # (B, ND)
    cmd: jnp.ndarray,        # (B, ND)
    jdqd: jnp.ndarray,       # (B, ND)
    fr_des: jnp.ndarray,     # (B, NJ)
    q: jnp.ndarray,          # (B, NJ)
    damping: float,
    w_floating: float,
    w_rf: float,
    mu: float,
    max_fz: float,
    pdip_iters: int,
    pdip_reg: float = 1e-9,
    pdip_tau: float = 0.995,
    pdip_mu_min: float = 1e-10,
    pdip_slack_floor: float = 1e-14,
    pdip_big_clamp: float = 1e4,
    interpret: bool = False,
):
    """Fused WBC solve.  Returns (des_jpos, des_jvel, tau, fr), each
    (B, 12)."""
    B = q.shape[0]
    C = 128
    f32 = jnp.float32

    pad = (-B) % C
    args = (A, Ainv, bvec, Jc, Jcdqd, cmask, R, err, vel, cmd, jdqd,
            fr_des, q)
    if pad:
        padv = lambda t: jnp.concatenate(
            [t, jnp.repeat(t[-1:], pad, axis=0)], axis=0
        )
        args = tuple(map(padv, args))
    Bp = args[0].shape[0]
    nc = Bp // C

    def to_lanes(t):
        extra = t.shape[1:]
        return jnp.moveaxis(t.astype(f32).reshape((nc, C) + extra), 1, -1)

    lanes = tuple(map(to_lanes, args))

    kernel = functools.partial(
        _kernel,
        damping=float(damping), w_floating=float(w_floating),
        w_rf=float(w_rf), mu=float(mu), max_fz=float(max_fz),
        pdip_iters=int(pdip_iters), pdip_reg=float(pdip_reg),
        pdip_tau=float(pdip_tau), pdip_mu_min=float(pdip_mu_min),
        pdip_slack_floor=float(pdip_slack_floor),
        pdip_big_clamp=float(pdip_big_clamp),
    )
    chunk = lambda *shape: pl.BlockSpec(
        (None,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            chunk(ND, ND, C), chunk(ND, ND, C), chunk(ND, C),
            chunk(NJ, ND, C), chunk(NJ, C), chunk(4, C), chunk(3, 3, C),
            chunk(ND, C), chunk(ND, C), chunk(ND, C), chunk(ND, C),
            chunk(NJ, C), chunk(NJ, C),
        ],
        out_specs=[chunk(NJ, C)] * 4,
        out_shape=[jax.ShapeDtypeStruct((nc, NJ, C), f32)] * 4,
        interpret=interpret,
    )(*lanes)

    def from_lanes(t):
        return jnp.moveaxis(t, -1, 1).reshape(Bp, NJ)[:B]

    return tuple(from_lanes(t) for t in outs)
