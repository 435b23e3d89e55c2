"""Stage-wise (sparse) MPC solver: Riccati-ADMM for long horizons.

Rebuilds the role of SparseCMPC (src/common/SparseCMPC/SparseCMPC.cpp):
the reference hands the non-condensed stage-wise QP (per-step dynamics
equality triples, z-force bounds, friction pyramids,
SparseCMPC.cpp:191-336) to OSQP's generic sparse ADMM.  The TPU-native
formulation specializes the linear algebra instead: the ADMM x-update is
an equality-constrained tracking LQR solved by a Riccati sweep
(jax.lax.scan over stages, O(h) with 13x13/13x12 blocks), so cost per
iteration is linear in horizon instead of the condensed method's O(h^2)
memory / O(h^3) factorization — the "sequence-parallel analog" axis of
SURVEY.md section 5 (an associative-scan Riccati is the follow-on).

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


def solve(
    prob: StagewiseProblem, cfg: ADMMConfig
) -> tuple[jnp.ndarray, dict]:
    """ADMM with Riccati x-update.  Returns (U (..., h, 12), info)."""
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

    def iteration(carry, _):
        U, z, y = carry
        r_lin = con.apply_T(
            prob.F, (rho * z - y).reshape(batch + (h * 20,))
        ).reshape(batch + (h, NU))
        U_new = lqr_solve(prob, G, r_lin)
        Fu_new = con.apply(prob.F, U_new.reshape(batch + (h * NU,))).reshape(
            batch + (h, 20)
        )
        z_new = jnp.clip(Fu_new + y / rho, l_flat, u_flat)
        y_new = y + rho * (Fu_new - z_new)
        return (U_new, z_new, y_new), None

    (U, z, y), _ = jax.lax.scan(
        iteration, (U, z, y), None, length=cfg.iterations
    )
    return U, {"z": z, "y": y}
