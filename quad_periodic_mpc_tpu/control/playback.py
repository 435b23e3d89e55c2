"""Offline control-plan playback — the BackFlip/FrontJump tier rebuild.

Rebuilds DataReader (src/controllers/BackFlip/DataReader.cpp:33-116) and
BackFlipCtrl (BackFlipCtrl.cpp:12-140): a control plan is a float32
binary of rows with 22 columns —
  [0:7)  planar configuration (x, z, pitch, q_f_hip, q_f_knee,
         q_r_hip, q_r_knee)
  [7:14) velocities in the same order
  [14:18) feedforward torques (front hip, front knee, rear hip, rear
         knee) — tau_offset = 14 (DataReader.hpp:11)
  [18:22) reserved / contact force data
Playback mirrors the planar plan to both legs of each pair, applies
tau_mult = 1.2, holds a preparation pose, and blends to the landing
configuration between tuck_iteration = 600 and ramp_end = 650
(BackFlipCtrl.cpp:30-140).  The plan itself is data: we ship a
synthesizer for test plans rather than the reference's binary.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

PLAN_COLS = 22      # DataReader.hpp:20
TAU_OFFSET = 14     # DataReader.hpp:11


def load_plan(path: str) -> jnp.ndarray:
    """Binary float32 plan -> (T, 22) (load_control_plan,
    DataReader.cpp:33-77)."""
    raw = np.fromfile(path, dtype=np.float32)
    if raw.size % PLAN_COLS:
        raise ValueError(f"{path}: size not divisible by {PLAN_COLS}")
    return jnp.asarray(raw.reshape(-1, PLAN_COLS))


def save_plan(path: str, plan: np.ndarray) -> None:
    np.asarray(plan, np.float32).reshape(-1, PLAN_COLS).tofile(path)


def synthesize_jump_plan(
    timesteps: int = 800, dt: float = 0.001
) -> np.ndarray:
    """Generate a simple crouch-extend-tuck demo plan (test data; the
    reference ships a precomputed trajectory-optimization result)."""
    t = np.arange(timesteps) * dt
    plan = np.zeros((timesteps, PLAN_COLS), np.float32)
    crouch = t < 0.3
    thrust = (t >= 0.3) & (t < 0.45)
    q_hip = np.where(crouch, -1.0, np.where(thrust, -0.4, -1.3))
    q_knee = np.where(crouch, 2.2, np.where(thrust, 1.2, 2.4))
    plan[:, 3] = q_hip
    plan[:, 4] = q_knee
    plan[:, 5] = q_hip
    plan[:, 6] = q_knee
    plan[:, 10] = np.gradient(q_hip, dt)
    plan[:, 11] = np.gradient(q_knee, dt)
    plan[:, 12] = plan[:, 10]
    plan[:, 13] = plan[:, 11]
    plan[:, 14:18] = np.where(thrust[:, None], [[8.0, 16.0, 8.0, 16.0]], 0.0)
    return plan


class PlaybackOutput(NamedTuple):
    q_des: jnp.ndarray     # (..., 4, 3)
    qd_des: jnp.ndarray    # (..., 4, 3)
    tau_ff: jnp.ndarray    # (..., 4, 3)
    kp_joint: jnp.ndarray  # (..., 3)
    kd_joint: jnp.ndarray  # (..., 3)


def playback_command(
    plan: jnp.ndarray,
    iteration: jnp.ndarray,
    preparation: jnp.ndarray | bool = False,
    tuck_iteration: int = 600,
    ramp_end_iteration: int = 650,
    tau_mult: float = 1.2,
    landing_front: tuple = (-0.8425, 1.70),
    landing_rear: tuple = (-1.0525, 1.65),
) -> PlaybackOutput:
    """One playback tick (BackFlipCtrl::_update_joint_command,
    BackFlipCtrl.cpp:30-140), batched over `iteration`."""
    dtype = plan.dtype
    T = plan.shape[0]
    it = jnp.clip(jnp.asarray(iteration), 0, T - 1)
    prep = jnp.asarray(preparation)

    row = plan[it]                                  # (..., 22)
    mult = jnp.where(prep, 0.0, jnp.asarray(tau_mult, dtype))

    q_f = jnp.stack([jnp.zeros_like(row[..., 3]), row[..., 3], row[..., 4]], -1)
    q_r = jnp.stack([jnp.zeros_like(row[..., 5]), row[..., 5], row[..., 6]], -1)
    qd_f = jnp.stack([jnp.zeros_like(row[..., 10]), row[..., 10], row[..., 11]], -1)
    qd_r = jnp.stack([jnp.zeros_like(row[..., 12]), row[..., 12], row[..., 13]], -1)
    tau = row[..., TAU_OFFSET : TAU_OFFSET + 4]
    tau_f = jnp.stack(
        [jnp.zeros_like(tau[..., 0]), mult * tau[..., 0] / 2.0,
         mult * tau[..., 1] / 2.0], -1,
    )
    tau_r = jnp.stack(
        [jnp.zeros_like(tau[..., 2]), mult * tau[..., 2] / 2.0,
         mult * tau[..., 3] / 2.0], -1,
    )

    # landing ramp (BackFlipCtrl.cpp:88-122)
    in_ramp = it >= tuck_iteration
    s = jnp.clip(
        (it - tuck_iteration) / float(ramp_end_iteration - tuck_iteration),
        0.0, 1.0,
    ).astype(dtype)
    row0 = plan[jnp.minimum(tuck_iteration, T - 1)]
    q_f0 = jnp.stack([jnp.zeros_like(row0[..., 3]), row0[..., 3], row0[..., 4]], -1)
    q_r0 = jnp.stack([jnp.zeros_like(row0[..., 5]), row0[..., 5], row0[..., 6]], -1)
    q_ff = jnp.asarray([0.0, *landing_front], dtype)
    q_rf = jnp.asarray([0.0, *landing_rear], dtype)
    q_f = jnp.where(
        in_ramp[..., None], (1 - s[..., None]) * q_f0 + s[..., None] * q_ff, q_f
    )
    q_r = jnp.where(
        in_ramp[..., None], (1 - s[..., None]) * q_r0 + s[..., None] * q_rf, q_r
    )
    qd_f = jnp.where(in_ramp[..., None], 0.0, qd_f)
    qd_r = jnp.where(in_ramp[..., None], 0.0, qd_r)
    tau_f = jnp.where(in_ramp[..., None], 0.0, tau_f)
    tau_r = jnp.where(in_ramp[..., None], 0.0, tau_r)

    # legs: 0, 1 front; 2, 3 rear; abduction splays to +-0.2 during ramp
    # (BackFlipCtrl.cpp:126-133)
    s_ab = jnp.where(in_ramp, s, jnp.zeros_like(s))
    ab = s_ab[..., None] * jnp.asarray([-0.2, 0.2, -0.2, 0.2], dtype)
    q = jnp.stack([q_f, q_f, q_r, q_r], axis=-2)
    q = q.at[..., 0].set(ab)
    qd = jnp.stack([qd_f, qd_f, qd_r, qd_r], axis=-2)
    tau_out = jnp.stack([tau_f, tau_f, tau_r, tau_r], axis=-2)

    kp = jnp.where(
        in_ramp[..., None], jnp.asarray([25.0, 25.0, 25.0], dtype),
        jnp.asarray([10.0, 10.0, 10.0], dtype),
    )
    kd = jnp.where(
        in_ramp[..., None], jnp.asarray([1.5, 1.5, 1.5], dtype),
        jnp.asarray([1.0, 1.0, 1.0], dtype),
    )
    return PlaybackOutput(q_des=q, qd_des=qd, tau_ff=tau_out, kp_joint=kp,
                          kd_joint=kd)
