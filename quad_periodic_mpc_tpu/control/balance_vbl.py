"""Variation-based-linearization balance controller (VBL-LQR + QP).

Rebuilds BalanceControllerVBL + ReferenceGRF
(src/controllers/BalanceController/{BalanceControllerVBL,ReferenceGRF}.cpp),
the FSM_State_BalanceVBL stack:

1. ReferenceGRF: distribute m g across stance feet with moment balance —
   min |A z - b|^2 + alpha |z|^2 over the 4 normal forces, A rows
   [1 1 1 1; p_y; -p_x], b = [m g; 0; 0] (ReferenceGRF.cpp:176-203),
   swing feet pinned; here solved in closed form on masked normal
   equations (the reference's 4-var qpOASES solve).
2. Variation dynamics about (x_d, R_d, f_ref): state
   s = [e_x, e_dx, e_R, e_omega] with e_R = vee(1/2 (R_d^T R - R^T R_d))
   (calc_linear_error, BalanceControllerVBL.cpp:279-293); A_LQR/B_LQR per
   update_A_LQR/update_B_LQR (:301-411).
3. P from the CARE — batched doubling instead of the reference's
   Hamiltonian eigendecomposition (ops/linalg.care).
4. Force-delta QP: H = 2(R1+R2), g = 2(B_QP^T P^T s - R2 dF_prev),
   linearized cone |dF_xy| <= mu 0.7071 f_ref_z and normal bounds shifted
   by f_ref_z (calc_H/g/A/lbA, :461-536), solved with the batched PDIP on
   an 8-rows-per-foot block.  Output F = f_ref + dF.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import PDIPConfig
from quad_periodic_mpc_tpu.ops import linalg, qp_pdip
from quad_periodic_mpc_tpu.ops.qp_admm import QPData
from quad_periodic_mpc_tpu.ops.rotations import skew


@dataclasses.dataclass(frozen=True)
class VBLSettings:
    mass: float = 12.0
    inertia_body: tuple = (0.35, 2.1, 2.1)
    mu: float = 0.5
    # LQR weights (set_LQR_weights defaults used by FSM_State_BalanceVBL)
    q_x: tuple = (100.0, 100.0, 150.0)
    q_dx: tuple = (10.0, 10.0, 30.0)
    q_R: tuple = (200.0, 200.0, 100.0)
    q_omega: tuple = (10.0, 10.0, 10.0)
    alpha: float = 0.1      # R1 diagonal
    beta: float = 0.1       # R2 diagonal (rate penalty)
    min_force: float = 10.0
    max_force: float = 160.0
    big: float = 1e3
    care_dt: float = 1e-3
    care_iters: int = 30


def reference_grf(
    p_feet_des_rel: jnp.ndarray,   # (..., 4, 3) desired feet rel CoM, world
    contact: jnp.ndarray,          # (..., 4)
    cfg: VBLSettings = VBLSettings(),
    alpha: float = 1e-3,
) -> jnp.ndarray:
    """Desired normal-force distribution f_ref (z components; x/y zero).

    Closed-form masked ridge solve of the ReferenceGRF QP
    (ReferenceGRF.cpp:94-210).
    """
    dtype = p_feet_des_rel.dtype
    ones = jnp.ones_like(p_feet_des_rel[..., 0])
    A = jnp.stack(
        [ones, p_feet_des_rel[..., 1], -p_feet_des_rel[..., 0]], axis=-2
    )                                                     # (..., 3, 4)
    b = jnp.stack(
        [jnp.full_like(ones[..., 0], cfg.mass * 9.81),
         jnp.zeros_like(ones[..., 0]), jnp.zeros_like(ones[..., 0])],
        axis=-1,
    )
    c = contact.astype(dtype)
    # swing pinning via a large diagonal penalty (exact as penalty -> inf)
    pen = alpha + (1.0 - c) * 1e9
    H = jnp.einsum("...ik,...il->...kl", A, A) + jnp.eye(4, dtype=dtype) * pen[..., None, :]
    rhs = jnp.einsum("...ik,...i->...k", A, b)
    fz = jnp.linalg.solve(H, rhs[..., None])[..., 0] * c
    zeros = jnp.zeros_like(fz)
    return jnp.stack([zeros, zeros, fz], axis=-1)          # (..., 4, 3)


def solve(
    x_com: jnp.ndarray,
    v_com: jnp.ndarray,
    R_body: jnp.ndarray,            # (..., 3, 3) body->world
    omega_world: jnp.ndarray,
    p_feet_des_rel: jnp.ndarray,    # (..., 4, 3) desired feet rel CoM
    x_des: jnp.ndarray,
    v_des: jnp.ndarray,
    R_des: jnp.ndarray,
    omega_des_world: jnp.ndarray,
    contact: jnp.ndarray,
    dF_prev: jnp.ndarray | None = None,
    cfg: VBLSettings = VBLSettings(),
    pdip: PDIPConfig = PDIPConfig(iterations=25),
) -> jnp.ndarray:
    """Returns world-frame foot forces (..., 4, 3) = f_ref + dF."""
    dtype = x_com.dtype
    batch = x_com.shape[:-1]
    c = contact.astype(dtype)
    Ig = jnp.diag(jnp.asarray(cfg.inertia_body, dtype))
    Ig_inv = jnp.linalg.inv(Ig)

    f_ref = reference_grf(p_feet_des_rel, contact, cfg)    # (..., 4, 3)

    # --- variation state s (calc_linear_error) ---
    RdT_R = jnp.swapaxes(R_des, -1, -2) @ R_body
    e_R_mat = 0.5 * (RdT_R - jnp.swapaxes(RdT_R, -1, -2))
    e_R = jnp.stack(
        [e_R_mat[..., 2, 1], e_R_mat[..., 0, 2], e_R_mat[..., 1, 0]], axis=-1
    )
    omega_b = jnp.einsum("...ji,...j->...i", R_body, omega_world)
    omega_d_b = jnp.einsum("...ji,...j->...i", R_des, omega_des_world)
    e_omega = omega_b - jnp.einsum(
        "...ij,...j->...i", RdT_R.swapaxes(-1, -2), omega_d_b
    )
    s = jnp.concatenate(
        [x_com - x_des, v_com - v_des, e_R, e_omega], axis=-1
    )

    # --- variation dynamics (update_A_LQR / update_B_LQR) ---
    A = jnp.zeros(batch + (12, 12), dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    A = A.at[..., 0:3, 3:6].set(eye3)
    A = A.at[..., 6:9, 9:12].set(eye3)
    A = A.at[..., 6:9, 6:9].set(skew(-omega_d_b))
    RdT = jnp.swapaxes(R_des, -1, -2)
    sum_f = jnp.sum(
        Ig_inv @ RdT[..., None, :, :] @ skew(f_ref), axis=-3
    )
    A = A.at[..., 9:12, 0:3].set(sum_f)
    rxf = jnp.cross(p_feet_des_rel, f_ref)
    sum_rxf = jnp.sum(
        Ig_inv @ RdT[..., None, :, :] @ skew(rxf), axis=-3
    )
    A = A.at[..., 9:12, 6:9].set(sum_rxf)

    B = jnp.zeros(batch + (12, 12), dtype)
    for leg in range(4):
        mask = c[..., leg, None, None]
        B = B.at[..., 3:6, 3 * leg : 3 * leg + 3].set(
            mask * eye3 / cfg.mass
        )
        B = B.at[..., 9:12, 3 * leg : 3 * leg + 3].set(
            mask * (Ig_inv @ RdT @ skew(p_feet_des_rel[..., leg, :]))
        )

    Q1 = jnp.diag(jnp.asarray(
        cfg.q_x + cfg.q_dx + cfg.q_R + cfg.q_omega, dtype
    ))
    R1 = cfg.alpha * jnp.eye(12, dtype=dtype)
    P = linalg.care(
        A, B, jnp.broadcast_to(Q1, A.shape), jnp.broadcast_to(R1, A.shape),
        dt=cfg.care_dt, iters=cfg.care_iters,
    )

    # --- force-delta QP (calc_H/g/A/lbA) ---
    H = 2.0 * (cfg.alpha + cfg.beta) * jnp.eye(12, dtype=dtype)
    if dF_prev is None:
        dF_prev = jnp.zeros(batch + (12,), dtype)
    g = 2.0 * (
        jnp.einsum("...ji,...jk,...k->...i", B, jnp.swapaxes(P, -1, -2), s)
        - cfg.beta * dF_prev
    )

    mu7 = cfg.mu * 0.7071
    F = jnp.asarray(
        [
            [1.0, 0.0, -mu7],
            [0.0, 1.0, -mu7],
            [0.0, 1.0, mu7],
            [1.0, 0.0, mu7],
            [0.0, 0.0, 1.0],
            [1.0, 0.0, 0.0],     # variable-bound rows (contact gating)
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
        ],
        dtype,
    )
    big = jnp.asarray(cfg.big, dtype)
    fz_ref = f_ref[..., 2]
    l_foot = jnp.stack(
        [
            -big * c, -big * c,
            -mu7 * fz_ref, -mu7 * fz_ref,
            cfg.min_force * c - fz_ref,
            -big * c, -big * c, -big * c,
        ],
        axis=-1,
    )
    u_foot = jnp.stack(
        [
            mu7 * fz_ref, mu7 * fz_ref,
            big * c, big * c,
            cfg.max_force * c - fz_ref,
            big * c, big * c, big * c,
        ],
        axis=-1,
    )
    qp = QPData(
        P=jnp.broadcast_to(H, batch + (12, 12)),
        q=g,
        F=F,
        l=l_foot.reshape(batch + (32,)),
        u=u_foot.reshape(batch + (32,)),
    )
    dF, _ = qp_pdip.solve(qp, pdip)
    return f_ref + dF.reshape(batch + (4, 3))
