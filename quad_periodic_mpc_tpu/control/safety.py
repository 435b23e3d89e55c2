"""Safety checks as vectorized validity masks + clamps.

Rebuilds SafetyChecker (src/fsm/SafetyChecker.cpp) and the locomotion
safety guard (FSM_State_Locomotion.cpp:206-248) as pure functions: each
check returns (ok_mask, clamped_values) so a batch of instances can carry
per-instance safety status — the reference's print-and-mutate checks
become data (the FSM consumes the masks, control/fsm.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quad_periodic_mpc_tpu.models.a1 import RobotModel


class SafetyResult(NamedTuple):
    safe_orientation: jnp.ndarray   # (...,) bool (pre-check)
    safe_p_des: jnp.ndarray         # (...,) bool (post-check)
    safe_force: jnp.ndarray         # (...,) bool (post-check)
    p_des: jnp.ndarray              # (..., 4, 3) clamped
    force_ff: jnp.ndarray           # (..., 4, 3) clamped


def check_safe_orientation(rpy: jnp.ndarray) -> jnp.ndarray:
    """|roll|, |pitch| < 1.0 rad (SafetyChecker.cpp:21-36)."""
    return (jnp.abs(rpy[..., 0]) < 1.0) & (jnp.abs(rpy[..., 1]) < 1.0)


def clamp_p_des(
    p_des: jnp.ndarray, model: RobotModel
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Leg-frame desired-foot-position box (checkPDesFoot,
    SafetyChecker.cpp:43-115): |x|, |y| <= maxLegLength sin(60 deg),
    z in [-maxLegLength, -maxLegLength/4]."""
    max_len = model.leg.max_leg_length
    max_pdes = max_len * jnp.sin(jnp.asarray(1.0472, p_des.dtype))
    clamped = p_des
    clamped = clamped.at[..., 0].set(jnp.clip(p_des[..., 0], -max_pdes, max_pdes))
    clamped = clamped.at[..., 1].set(jnp.clip(p_des[..., 1], -max_pdes, max_pdes))
    clamped = clamped.at[..., 2].set(
        jnp.clip(p_des[..., 2], -max_len, -max_len / 4.0)
    )
    ok = jnp.all(
        jnp.isclose(clamped, p_des, atol=0.0, rtol=0.0), axis=(-1, -2)
    )
    return clamped, ok


def clamp_force_ff(
    force_ff: jnp.ndarray, limit: float = 350.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Feedforward-force box clamp at +-350 N per axis
    (checkForceFeedForward, SafetyChecker.cpp:121-190)."""
    clamped = jnp.clip(force_ff, -limit, limit)
    ok = jnp.all(clamped == force_ff, axis=(-1, -2))
    return clamped, ok


def check_locomotion_safe(
    rpy: jnp.ndarray,
    p_leg: jnp.ndarray,
    v_leg: jnp.ndarray,
    max_roll_deg: float = 40.0,
    max_pitch_deg: float = 40.0,
    max_leg_speed: float = 9.0,
) -> jnp.ndarray:
    """locomotionSafe() (FSM_State_Locomotion.cpp:206-248): roll/pitch
    under 40 deg, feet below hips, |y| <= 0.18, leg speed < 9 m/s.
    Failing instances auto-transition to RecoveryStand in the FSM."""
    deg = jnp.pi / 180.0
    ok = (jnp.abs(rpy[..., 0]) <= max_roll_deg * deg) & (
        jnp.abs(rpy[..., 1]) <= max_pitch_deg * deg
    )
    ok &= jnp.all(p_leg[..., 2] <= 0.0, axis=-1)
    ok &= jnp.all(jnp.abs(p_leg[..., 1]) <= 0.18, axis=-1)
    speed = jnp.linalg.norm(v_leg, axis=-1)
    ok &= jnp.all(speed <= max_leg_speed, axis=-1)
    return ok


def run_checks(
    rpy: jnp.ndarray,
    p_des: jnp.ndarray,
    force_ff: jnp.ndarray,
    model: RobotModel,
) -> SafetyResult:
    """Full pre+post check pass (ControlFSM::safetyPreCheck/PostCheck,
    ControlFSM.cpp:255-316)."""
    p_clamped, p_ok = clamp_p_des(p_des, model)
    f_clamped, f_ok = clamp_force_ff(force_ff)
    return SafetyResult(
        safe_orientation=check_safe_orientation(rpy),
        safe_p_des=p_ok,
        safe_force=f_ok,
        p_des=p_clamped,
        force_ff=f_clamped,
    )
