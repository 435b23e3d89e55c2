"""Leg-frame control abstraction — the LegController + torque-calculator
rebuild (src/common/Controllers/LegController.{h,cpp} and
Body_Manager::_torqueCalculator, be2r_cmpc_unitree.cpp:657-719), batched
over 4 legs x instances.

Data path  (updateData, LegController.cpp:95-116):
    (q, qd) -> p = FK(q), v = J(q) qd            per leg, leg-local frame
Command path (updateCommand, LegController.cpp:123-215):
    f  = forceFeedForward + Kp (pDes - p) + Ki sat-integral + Kd (vDes - v)
    tau_ff = tauFeedForward + J^T f
Torque calculator (be2r_cmpc_unitree.cpp:657-719):
    tau = Kp_joint (qDes - q) + Kd_joint (qdDes - qd) + tau_ff
    clamped to 17/17/26 Nm (3 Nm safe mode), then hip/knee signs flipped
    for the Unitree motor convention.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quad_periodic_mpc_tpu.models.a1 import RobotModel
from quad_periodic_mpc_tpu.models import leg_kinematics as lk


class LegData(NamedTuple):
    """Per-leg measured state (LegControllerData)."""

    q: jnp.ndarray    # (..., 4, 3)
    qd: jnp.ndarray   # (..., 4, 3)
    p: jnp.ndarray    # (..., 4, 3) foot pos, leg-local
    v: jnp.ndarray    # (..., 4, 3) foot vel, leg-local
    J: jnp.ndarray    # (..., 4, 3, 3)


class LegCommand(NamedTuple):
    """Per-leg command (LegControllerCommand); gains are diagonal (3,)."""

    tau_ff: jnp.ndarray       # (..., 4, 3)
    force_ff: jnp.ndarray     # (..., 4, 3)
    q_des: jnp.ndarray        # (..., 4, 3)
    qd_des: jnp.ndarray       # (..., 4, 3)
    p_des: jnp.ndarray        # (..., 4, 3)
    v_des: jnp.ndarray        # (..., 4, 3)
    kp_cartesian: jnp.ndarray # (..., 4, 3)
    kd_cartesian: jnp.ndarray # (..., 4, 3)
    kp_joint: jnp.ndarray     # (..., 4, 3)
    kd_joint: jnp.ndarray     # (..., 4, 3)

    @staticmethod
    def zeros(batch: tuple = (), dtype=jnp.float32) -> "LegCommand":
        z = lambda: jnp.zeros(batch + (4, 3), dtype)
        return LegCommand(z(), z(), z(), z(), z(), z(), z(), z(), z(), z())


def _geom(model: RobotModel) -> lk.LegGeometry:
    return lk.LegGeometry(
        l1=model.leg.abad_link_length,
        l2=model.leg.hip_link_length,
        l3=model.leg.knee_link_length,
    )


def update_data(
    q: jnp.ndarray, qd: jnp.ndarray, model: RobotModel
) -> LegData:
    """(q, qd) (..., 4, 3) -> LegData with FK/Jacobian evaluated
    (LegController.cpp:95-116)."""
    geom = _geom(model)
    side = jnp.asarray(model.side_signs(), q.dtype)
    J = lk.leg_jacobian(q, geom, side)
    p = lk.foot_position(q, geom, side)
    v = jnp.einsum("...ij,...j->...i", J, qd)
    return LegData(q=q, qd=qd, p=p, v=v, J=J)


def cartesian_impedance(
    cmd: LegCommand, data: LegData
) -> jnp.ndarray:
    """Cartesian PD + feedforward force -> feedforward joint torque
    (updateCommand, LegController.cpp:123-156; integral term omitted —
    kiCartesian defaults to zero in the reference configs)."""
    f = (
        cmd.force_ff
        + cmd.kp_cartesian * (cmd.p_des - data.p)
        + cmd.kd_cartesian * (cmd.v_des - data.v)
    )
    return cmd.tau_ff + jnp.einsum("...ji,...j->...i", data.J, f)


def torque_output(
    cmd: LegCommand,
    data: LegData,
    model: RobotModel,
    safe_mode: jnp.ndarray | bool = False,
    low_level: bool = False,
    flip_signs: bool = True,
) -> jnp.ndarray:
    """Final motor torques (..., 4, 3) with clamping and Unitree sign
    convention (_torqueCalculator, be2r_cmpc_unitree.cpp:657-719)."""
    tau_ff = cartesian_impedance(cmd, data)
    if low_level:
        tau = tau_ff
    else:
        tau = (
            cmd.kp_joint * (cmd.q_des - data.q)
            + cmd.kd_joint * (cmd.qd_des - data.qd)
            + tau_ff
        )
    limits = jnp.asarray(model.tau_max, tau.dtype)
    safe = jnp.asarray(safe_mode)
    lim = jnp.where(safe[..., None, None], model.tau_safe, limits)
    tau = jnp.clip(tau, -lim, lim)
    if flip_signs:
        # hip and knee axes are mirrored on the Unitree motors
        # (be2r_cmpc_unitree.cpp:717-718)
        tau = tau * jnp.asarray([1.0, -1.0, -1.0], tau.dtype)
    return tau


def stance_command_from_mpc(
    f_ff_world: jnp.ndarray,
    R_body: jnp.ndarray,
    kd_joint: jnp.ndarray,
    batch: tuple = (),
) -> dict:
    """Helper: the stance-leg command fields the locomotion driver writes
    when WBC is off (ConvexMPCLocomotion.cpp:428-437): feedforward force
    + joint damping."""
    return dict(force_ff=f_ff_world, kd_joint=kd_joint)
