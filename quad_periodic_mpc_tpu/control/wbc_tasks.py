"""TaskSet / ContactSet variants beyond the locomotion path.

The locomotion WBC (control/wbc.py) builds BodyOri + BodyPos + 4x
LinkPos tasks and 4 SingleContacts.  The reference additionally ships
(src/controllers/WBC_Ctrl/TaskSet/, ContactSet/):

- JPosTask        — joint-space posture task (JPosTask.cpp:7-46):
                    Jt = [0 | I12], op_cmd = Kp e + Kd (qd_des - qd) + a;
- BodyRyRzTask    — pitch/yaw-only orientation (BodyRyRzTask.cpp:12-59):
                    Jt rows = body-frame omega_y/omega_z selectors, error
                    = components 1:3 of the implicit so3 quaternion error;
- LocalPosTask    — link position RELATIVE to another frame
                    (LocalPosTask.cpp:26-77): Jt = Jc[link] - Jc[frame];
- FixedBodyContact — 6-DoF body-pinned contact (FixedBodyContact.cpp:5-11):
                    Jc = [I6 | 0], no friction rows (Uf = 0, ieq = 0);
- BodyPostureTask — 6-DoF pose task (BodyPostureTask.cpp:11-95);
- LocalRollTask   — scalar roll complement of RyRz (LocalRollTask.cpp).
  (LocalHeadPos/LocalTailPos target Cheetah-3 head/tail hardware absent
  on the A1 and are intentionally out of scope.)

Each task constructor returns the (J, err, vel_des, cmd, jdqd) tuple the
kin_wbc / wbic cascades consume, so the variants compose freely with the
locomotion tasks.  All batched.
"""

from __future__ import annotations

import jax.numpy as jnp

from quad_periodic_mpc_tpu.models import floating_base as fb
from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat

N_DOF = 18


def _zeros_like_batch(state: fb.FBState, *shape):
    return jnp.zeros(state.pos.shape[:-1] + shape, state.pos.dtype)


def jpos_task(
    state: fb.FBState,
    q_des: jnp.ndarray,              # (..., 12)
    qd_des: jnp.ndarray | None = None,
    qdd_des: jnp.ndarray | None = None,
    kp: float = 50.0,
    kd: float = 5.0,
):
    """Joint posture task (JPosTask.cpp:7-46; default gains :15-16)."""
    dtype = state.pos.dtype
    batch = state.pos.shape[:-1]
    if qd_des is None:
        qd_des = jnp.zeros_like(q_des)
    if qdd_des is None:
        qdd_des = jnp.zeros_like(q_des)
    J = jnp.zeros(batch + (12, N_DOF), dtype)
    J = J.at[..., :, 6:].set(jnp.eye(12, dtype=dtype))
    err = q_des - state.q
    cmd = kp * err + kd * (qd_des - state.qd) + qdd_des
    return J, err, qd_des, cmd, _zeros_like_batch(state, 12)


def _ori_so3_error(state: fb.FBState, quat_des: jnp.ndarray) -> jnp.ndarray:
    """Implicit so3 orientation error (BodyRyRzTask.cpp:27-48 /
    BodyOriTask): so3(quat(q^-1 * q_des)), w-positive branch."""
    from quad_periodic_mpc_tpu.estimation.orientation import quat_product

    q_inv = state.quat * jnp.asarray([1.0, -1.0, -1.0, -1.0], state.pos.dtype)
    ori_err_q = quat_product(q_inv, quat_des)
    ori_err_q = jnp.where(ori_err_q[..., 0:1] < 0, -ori_err_q, ori_err_q)
    vec = ori_err_q[..., 1:4]
    vn = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn, ori_err_q[..., 0:1])
    return jnp.where(vn > 1e-9, vec / jnp.maximum(vn, 1e-12) * angle, 2.0 * vec)


def body_ryrz_task(
    state: fb.FBState,
    quat_des: jnp.ndarray,           # (..., 4) wxyz (or rpy via helper)
    vel_des: jnp.ndarray | None = None,   # (..., 2) omega_y/z desired
    acc_des: jnp.ndarray | None = None,
    kp: float = 50.0,
    kd: float = 3.0,
):
    """Pitch/yaw-only body orientation task (BodyRyRzTask.cpp:12-75):
    roll is left free (used when a roll DOF is deliberately released,
    e.g. two-leg balance experiments).  Jt selects body-frame omega_y,
    omega_z directly (Jt_.block(0,1,2,2).setIdentity(), :14-15)."""
    dtype = state.pos.dtype
    batch = state.pos.shape[:-1]
    if vel_des is None:
        vel_des = jnp.zeros(batch + (2,), dtype)
    if acc_des is None:
        acc_des = jnp.zeros(batch + (2,), dtype)
    so3 = _ori_so3_error(state, quat_des)
    omega_body = state.v_body[..., 0:3]
    err = so3[..., 1:3]                           # Kp_kin = 1 (:52)
    cmd = kp * err + kd * (vel_des - omega_body[..., 1:3]) + acc_des
    J = jnp.zeros(batch + (2, N_DOF), dtype)
    J = J.at[..., 0, 1].set(1.0)
    J = J.at[..., 1, 2].set(1.0)
    return J, err, vel_des, cmd, _zeros_like_batch(state, 2)


def body_ryrz_task_rpy(state: fb.FBState, rpy_des: jnp.ndarray, **kw):
    return body_ryrz_task(state, rpy_to_quat(rpy_des), **kw)


def local_pos_task(
    state: fb.FBState,
    contact: fb.ContactInfo,
    link_idx: int,
    frame_idx: int,
    pos_des_rel: jnp.ndarray,        # (..., 3) desired p[link] - p[frame]
    vel_des: jnp.ndarray | None = None,
    acc_des: jnp.ndarray | None = None,
    kp: float = 120.0,
    kd: float = 5.0,
):
    """Relative link-position task (LocalPosTask.cpp:26-77): tracks
    p[link] - p[frame] with Jt = Jc[link] - Jc[frame], so the task is
    invariant to rigid translation of the pair (foot-relative targets)."""
    if vel_des is None:
        vel_des = jnp.zeros_like(pos_des_rel)
    if acc_des is None:
        acc_des = jnp.zeros_like(pos_des_rel)
    gen_vel = jnp.concatenate([state.v_body, state.qd], axis=-1)
    J = contact.Jc[..., link_idx, :, :] - contact.Jc[..., frame_idx, :, :]
    p_rel = contact.p_foot[..., link_idx, :] - contact.p_foot[..., frame_idx, :]
    v_rel = jnp.einsum("...ij,...j->...i", J, gen_vel)
    err = pos_des_rel - p_rel
    cmd = kp * err + kd * (vel_des - v_rel) + acc_des
    jdqd = contact.Jcdqd[..., link_idx, :] - contact.Jcdqd[..., frame_idx, :]
    return J, err, vel_des, cmd, jdqd


def fixed_body_contact(batch: tuple = (), dtype=jnp.float32):
    """Body-pinned 6-DoF contact (FixedBodyContact.cpp:5-11): Jc = [I6|0]
    on the floating-base coordinates, zero JcDotQdot, and NO friction
    inequality (Uf = 0 row, ieq = 0 — trivially satisfied).

    Returns (Jc (..., 6, 18), Jcdqd (..., 6), Uf (1, 6), ieq (1,)).
    """
    Jc = jnp.zeros(batch + (6, N_DOF), dtype)
    Jc = Jc.at[..., :, 0:6].set(jnp.eye(6, dtype=dtype))
    Jcdqd = jnp.zeros(batch + (6,), dtype)
    Uf = jnp.zeros((1, 6), dtype)
    ieq = jnp.zeros((1,), dtype)
    return Jc, Jcdqd, Uf, ieq


def body_posture_task(
    state: fb.FBState,
    quat_des: jnp.ndarray,           # (..., 4) wxyz
    pos_des: jnp.ndarray,            # (..., 3)
    vel_des: jnp.ndarray | None = None,   # (..., 6) [omega; v], body frame
    acc_des: jnp.ndarray | None = None,
    kp: float = 50.0,
    kd: float = 1.0,
):
    """6-DoF body posture task (BodyPostureTask.cpp:11-95): orientation
    so3 error + world position error, linear velocity compared in the
    WORLD frame, Jt = blkdiag(R, R) (body->world) on the floating-base
    columns (:91-92 — Rot.transpose() of the reference's world->body
    quaternionToRotationMatrix)."""
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat

    dtype = state.pos.dtype
    batch = state.pos.shape[:-1]
    if vel_des is None:
        vel_des = jnp.zeros(batch + (6,), dtype)
    if acc_des is None:
        acc_des = jnp.zeros(batch + (6,), dtype)
    R = quat_to_rotmat(state.quat)                # body -> world
    # reference error: quat_cmd * q^-1 (note: opposite order to RyRz)
    from quad_periodic_mpc_tpu.estimation.orientation import quat_product

    q_inv = state.quat * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype)
    ori_err_q = quat_product(quat_des, q_inv)
    ori_err_q = jnp.where(ori_err_q[..., 0:1] < 0, -ori_err_q, ori_err_q)
    vec = ori_err_q[..., 1:4]
    vn = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn, ori_err_q[..., 0:1])
    so3 = jnp.where(vn > 1e-9, vec / jnp.maximum(vn, 1e-12) * angle, 2.0 * vec)

    # curr_vel: the reference leaves omega in the body frame and maps the
    # linear part with Rot.transpose() (:50-51).  ori::
    # quaternionToRotationMatrix returns the TRANSPOSED (world->body)
    # matrix, so Rot^T is body->world = our R: the linear velocity is
    # compared in the WORLD frame — the same convention as wbc.py's
    # BodyPos task (v_world = R @ v_body).
    v_lin = jnp.einsum("...ij,...j->...i", R, state.v_body[..., 3:6])
    curr_vel = jnp.concatenate([state.v_body[..., 0:3], v_lin], axis=-1)

    pos_err = pos_des - state.pos
    err = jnp.concatenate([so3, pos_err], axis=-1)
    cmd = kp * err + kd * (vel_des - curr_vel) + acc_des
    # Jt = blkdiag(Rot^T, Rot^T) (:91-92) = blkdiag(R, R) body->world.
    J = jnp.zeros(batch + (6, N_DOF), dtype)
    J = J.at[..., 0:3, 0:3].set(R)
    J = J.at[..., 3:6, 3:6].set(R)
    return J, err, vel_des, cmd, _zeros_like_batch(state, 6)


def local_roll_task(
    state: fb.FBState,
    roll_des: jnp.ndarray,           # (...,)
    vel_des: jnp.ndarray | None = None,
    acc_des: jnp.ndarray | None = None,
    kp: float = 350.0,
    kd: float = 13.0,
):
    """Roll-only task (LocalRollTask.cpp:14-45): scalar rpy[0] error on
    the body-frame omega_x row (Jt(0,0) = 1) — the complement of
    BodyRyRzTask for deliberately split orientation control."""
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rpy

    dtype = state.pos.dtype
    batch = state.pos.shape[:-1]
    if vel_des is None:
        vel_des = jnp.zeros(batch + (1,), dtype)
    if acc_des is None:
        acc_des = jnp.zeros(batch + (1,), dtype)
    rpy = quat_to_rpy(state.quat)
    err = (roll_des - rpy[..., 0])[..., None]     # Kp_kin = 1 (:18)
    cmd = kp * err + kd * (vel_des - state.v_body[..., 0:1]) + acc_des
    J = jnp.zeros(batch + (1, N_DOF), dtype)
    J = J.at[..., 0, 0].set(1.0)
    return J, err, vel_des, cmd, _zeros_like_batch(state, 1)
