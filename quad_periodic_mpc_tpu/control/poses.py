"""Pose-transition FSM state behaviors: StandUp / LayDown / RecoveryStand.

Rebuilds the non-MPC FSM states as pure command generators:

- stand_up_impedance (FSM_State_StandUp.cpp:90-121): cartesian impedance
  ramp — foot z blends from the initial pose to -hMax (0.33 m) over 2 s
  (progress = 0.5 * t), with per-leg gravity feedforward -m g / 4;
- lay_down: the inverse ramp (FSM_State_LayDown semantics);
- recovery poses (FSM_State_RecoveryStand.cpp:31-45): fold
  (0, -1.4, 2.7), stand (0, -0.8, 1.6), rollover (1.5/1.3, -1.6/-3.1,
  2.77) joint targets with linear ramps — the fold -> stand sequence that
  the FSM routes unsafe locomotion into.

All outputs are LegCommand-shaped arrays, batched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

FOLD_JPOS = ((0.0, -1.4, 2.7),) * 4                       # RecoveryStand.cpp:31-34
STAND_JPOS = ((0.0, -0.8, 1.6),) * 4                      # :38-39
ROLL_JPOS = (
    (1.5, -1.6, 2.77), (1.3, -3.1, 2.77),
    (1.5, -1.6, 2.77), (1.3, -3.1, 2.77),
)                                                          # :42-44


class PoseCommand(NamedTuple):
    p_des: jnp.ndarray        # (..., 4, 3) leg-frame foot targets (or NaN)
    q_des: jnp.ndarray        # (..., 4, 3) joint targets (or NaN)
    force_ff: jnp.ndarray     # (..., 4, 3)
    progress: jnp.ndarray     # (...,)


def stand_up_impedance(
    t: jnp.ndarray,
    ini_foot_pos: jnp.ndarray,     # (..., 4, 3) leg-frame feet at entry
    R_body: jnp.ndarray,           # (..., 3, 3) world->body (rBody)
    mass: float = 6.0,
    h_max: float = 0.33,
) -> PoseCommand:
    """Impedance stand-up ramp (standUpImpedance,
    FSM_State_StandUp.cpp:90-121)."""
    dtype = ini_foot_pos.dtype
    progress = jnp.clip(0.5 * t, 0.0, 1.0).astype(dtype)
    p_des = ini_foot_pos.at[..., 2].set(
        progress[..., None] * (-h_max)
        + (1.0 - progress[..., None]) * ini_foot_pos[..., 2]
    )
    g_world = jnp.asarray([0.0, 0.0, -mass * 9.81 / 4.0], dtype)
    leg_force = jnp.einsum("...ij,j->...i", R_body, g_world)
    force_ff = jnp.broadcast_to(
        leg_force[..., None, :], p_des.shape
    )
    return PoseCommand(
        p_des=p_des,
        q_des=jnp.full_like(p_des, jnp.nan),
        force_ff=force_ff,
        progress=progress,
    )


def lay_down(
    t: jnp.ndarray,
    stand_foot_pos: jnp.ndarray,
    ini_foot_z: jnp.ndarray,
    duration: float = 2.0,
) -> PoseCommand:
    """Reverse ramp back toward the folded height (FSM_State_LayDown)."""
    dtype = stand_foot_pos.dtype
    progress = jnp.clip(t / duration, 0.0, 1.0).astype(dtype)
    p_des = stand_foot_pos.at[..., 2].set(
        (1.0 - progress[..., None]) * stand_foot_pos[..., 2]
        + progress[..., None] * ini_foot_z
    )
    return PoseCommand(
        p_des=p_des,
        q_des=jnp.full_like(p_des, jnp.nan),
        force_ff=jnp.zeros_like(p_des),
        progress=progress,
    )


def joint_ramp(
    t: jnp.ndarray,
    q_from: jnp.ndarray,       # (..., 4, 3)
    target: str | jnp.ndarray,
    duration: float,
) -> PoseCommand:
    """Linear joint-space ramp toward a named recovery pose (the
    _StandUp/_FoldLegs/_RollOver interpolation,
    FSM_State_RecoveryStand.cpp:117-200)."""
    dtype = q_from.dtype
    if isinstance(target, str):
        table = {"fold": FOLD_JPOS, "stand": STAND_JPOS, "rollover": ROLL_JPOS}
        q_to = jnp.asarray(table[target], dtype)
    else:
        q_to = target
    s = jnp.clip(t / duration, 0.0, 1.0).astype(dtype)
    q_des = (1.0 - s[..., None, None]) * q_from + s[..., None, None] * q_to
    return PoseCommand(
        p_des=jnp.full_like(q_des, jnp.nan),
        q_des=q_des,
        force_ff=jnp.zeros_like(q_des),
        progress=s,
    )
