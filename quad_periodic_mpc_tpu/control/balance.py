"""Stand-balance QP controller, batched.

Rebuilds BalanceController (src/controllers/BalanceController/
BalanceController.cpp, the Focchi-et-al. wrench-distribution QP used by
FSM_State_BalanceStand / BalanceVBL):

1. PD wrench command in the yaw-rotated frame (calc_PDcontrol, :332-359):
     b = [ m (xddot_des + Kp e_x + Kd e_dx + g);
           II (Kp_th log(R_err) + Kd_th e_dth) ]
   with II = Ryaw^T R Ig R^T Ryaw (Ig = diag(.35, 2.1, 2.1), :350).
2. Grasp matrix A (update_A_control, :385-396):
     A = [ Ryaw^T ... ; Ryaw^T [c_i p_i]x ... ]   (per foot columns)
3. QP (calc_H/g, :398-448):  min |A f - b|^2_S + alpha |f|^2_W
   s.t. friction pyramid + normal-force bounds per foot
   (calc_A/lbA/ubA, :408-503) and per-variable contact gating
   (calc_lb_ub, :450-470 — swing feet pinned to zero).

The reference's 12-var/20-con qpOASES solve becomes our batched PDIP on
an 8-rows-per-foot block (5 pyramid/normal rows + 3 identity rows for
the variable bounds), keeping the problem shape-static across contact
configurations.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import PDIPConfig
from quad_periodic_mpc_tpu.ops import qp_pdip
from quad_periodic_mpc_tpu.ops.qp_admm import QPData
from quad_periodic_mpc_tpu.ops.rotations import skew, yaw_rotmat


@dataclasses.dataclass(frozen=True)
class BalanceSettings:
    """Defaults per FSM_State_BalanceVBL.cpp:61,120-126 call site."""

    mass: float = 12.0
    inertia_body: tuple = (0.35, 2.1, 2.1)   # Ig (BalanceController.cpp:350)
    mu: float = 0.5
    alpha: float = 0.01
    com_weights: tuple = (1.0, 1.0, 10.0)
    base_weights: tuple = (10.0, 10.0, 10.0)
    kp_com: tuple = (30.0, 30.0, 30.0)
    kd_com: tuple = (10.0, 10.0, 10.0)
    kp_base: tuple = (80.0, 80.0, 50.0)
    kd_base: tuple = (20.0, 20.0, 20.0)
    min_force: float = 10.0
    max_force: float = 160.0
    big: float = 1e3


class BalanceCommand(NamedTuple):
    p_des: jnp.ndarray        # (..., 3) desired CoM position, world
    v_des: jnp.ndarray        # (..., 3)
    a_des: jnp.ndarray        # (..., 3) feedforward CoM acceleration
    R_des: jnp.ndarray        # (..., 3, 3) desired body orientation
    omega_des: jnp.ndarray    # (..., 3) desired world angular velocity


def matrix_log_rot(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log (matrixLogRot, BalanceController.cpp:705-730)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    s = jnp.sin(theta)
    scale = jnp.where(
        jnp.abs(s) > 1e-8, theta / (2.0 * jnp.where(s == 0, 1.0, s)), 0.5
    )
    return scale[..., None] * w


def solve(
    p_com: jnp.ndarray,
    v_com: jnp.ndarray,
    R_body: jnp.ndarray,          # (..., 3, 3) body->world
    omega_world: jnp.ndarray,
    yaw: jnp.ndarray,
    p_feet_rel: jnp.ndarray,      # (..., 4, 3) feet relative to CoM, world
    contact: jnp.ndarray,         # (..., 4) in {0, 1}
    cmd: BalanceCommand,
    cfg: BalanceSettings = BalanceSettings(),
    pdip: PDIPConfig = PDIPConfig(iterations=25),
) -> jnp.ndarray:
    """Returns world-frame foot forces (..., 4, 3)."""
    dtype = p_com.dtype
    batch = p_com.shape[:-1]
    Ryaw = yaw_rotmat(yaw)
    RyawT = jnp.swapaxes(Ryaw, -1, -2)

    # PD wrench (calc_PDcontrol)
    e_x = jnp.einsum("...ij,...j->...i", RyawT, cmd.p_des - p_com)
    e_dx = jnp.einsum("...ij,...j->...i", RyawT, cmd.v_des - v_com)
    R_err = RyawT @ cmd.R_des @ jnp.swapaxes(R_body, -1, -2) @ Ryaw
    e_th = matrix_log_rot(R_err)
    e_dth = jnp.einsum("...ij,...j->...i", RyawT, cmd.omega_des - omega_world)

    kp_c, kd_c = jnp.asarray(cfg.kp_com, dtype), jnp.asarray(cfg.kd_com, dtype)
    kp_b, kd_b = jnp.asarray(cfg.kp_base, dtype), jnp.asarray(cfg.kd_base, dtype)
    a_des = cmd.a_des + kp_c * e_x + kd_c * e_dx
    alpha_des = kp_b * e_th + kd_b * e_dth

    Ig = jnp.diag(jnp.asarray(cfg.inertia_body, dtype))
    II = RyawT @ R_body @ Ig @ jnp.swapaxes(R_body, -1, -2) @ Ryaw
    g_vec = jnp.asarray([0.0, 0.0, 9.81], dtype)
    b = jnp.concatenate(
        [
            cfg.mass * (a_des + g_vec),
            jnp.einsum("...ij,...j->...i", II, alpha_des),
        ],
        axis=-1,
    )

    # grasp matrix (update_A_control)
    A = jnp.zeros(batch + (6, 12), dtype)
    for i in range(4):
        A = A.at[..., 0:3, 3 * i : 3 * i + 3].set(RyawT)
        pc = contact[..., i, None] * p_feet_rel[..., i, :]
        A = A.at[..., 3:6, 3 * i : 3 * i + 3].set(RyawT @ skew(pc))

    # cost 2(A' S A + (alpha + 1e-3) I), g = -2 A' S b (calc_H/g; the
    # xOptPrev warm-regularization term is omitted: cold-start form)
    S = jnp.concatenate(
        [jnp.asarray(cfg.com_weights, dtype), jnp.asarray(cfg.base_weights, dtype)]
    )
    SA = S[..., :, None] * A
    P = 2.0 * (
        jnp.swapaxes(A, -1, -2) @ SA
        + (cfg.alpha + 1e-3) * jnp.eye(12, dtype=dtype)
    )
    q = -2.0 * jnp.einsum("...nm,...n->...m", SA, b)

    # constraint block per foot: 5 pyramid/normal rows + 3 identity rows
    # (variable bounds), directions n = z, t1 = x, t2 = y (flat ground)
    mu = cfg.mu
    F = jnp.asarray(
        [
            [1.0, 0.0, -mu],     # fx - mu fz in [-BIG c, 0]
            [0.0, 1.0, -mu],     # fy - mu fz in [-BIG c, 0]
            [0.0, 1.0, mu],      # fy + mu fz in [0, BIG c]
            [1.0, 0.0, mu],      # fx + mu fz in [0, BIG c]
            [0.0, 0.0, 1.0],     # fz in [min c, max c]
            [1.0, 0.0, 0.0],     # variable bounds (calc_lb_ub)
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
        ],
        dtype,
    )
    big = jnp.asarray(cfg.big, dtype)
    c = contact.astype(dtype)
    l_foot = jnp.stack(
        [
            -big * c, -big * c,
            jnp.zeros_like(c), jnp.zeros_like(c),
            cfg.min_force * c,
            -big * c, -big * c, -big * c,
        ],
        axis=-1,
    )
    u_foot = jnp.stack(
        [
            jnp.zeros_like(c), jnp.zeros_like(c),
            big * c, big * c,
            cfg.max_force * c,
            big * c, big * c, big * c,
        ],
        axis=-1,
    )
    l = l_foot.reshape(batch + (32,))
    u = u_foot.reshape(batch + (32,))

    qp = QPData(P=P, q=q, F=F, l=l, u=u)
    f, _ = qp_pdip.solve(qp, pdip)
    return f.reshape(batch + (4, 3))
