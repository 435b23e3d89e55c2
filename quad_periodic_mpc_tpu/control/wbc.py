"""Whole-body control tier: KinWBC + WBIC, batched and shape-static.

Rebuilds WBC_Ctrl / LocomotionCtrl (src/controllers/WBC_Ctrl/) +
KinWBC (src/controllers/WBC/WBIC/KinWBC.cpp) + WBIC
(src/controllers/WBC/WBIC/WBIC.cpp):

1. model update: floating-base mass matrix, gravity, Coriolis, contact
   Jacobians (WBC_Ctrl::_UpdateModel, WBC_Ctrl.cpp:171-205);
2. task list: body orientation, body position, one foot-position task per
   SWING leg; contact list: one point contact per STANCE leg
   (LocomotionCtrl::_ContactTaskUpdate, LocomotionCtrl.cpp:40-92);
3. KinWBC: contact-null-space projected task-priority IK producing
   des_jpos / des_jvel (KinWBC.cpp:16-90);
4. WBIC: dynamically consistent acceleration cascade + a relaxation QP in
   [delta qddot_float(6); delta F(12)] with floating-base dynamics
   equality and friction-cone inequality (WBIC.cpp:17-261); torque
   tau = (A qddot + cori + grav - Jc^T F)[6:].

TPU-first reformulation of the reference's shape-dynamic task/contact
lists: all 4 contacts and all 4 foot tasks always exist; stance/swing is
expressed by MASKS (zeroed Jacobian rows for inactive tasks/contacts +
zeroed force bounds for swing feet), which is exactly equivalent —
zero rows vanish from pseudoinverses, and fz in [0, 0] pins swing forces
(cf. the shape-static swing handling of the MPC QP).  The Goldfarb
active-set QP (WBIC.cpp:91) is replaced by eliminating the 6 equality
rows analytically (the inequalities touch only delta F) and solving the
remaining 12-var cone QP with the batched PDIP solver.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import PDIPConfig
from quad_periodic_mpc_tpu.models import floating_base as fb
from quad_periodic_mpc_tpu.ops import linalg, qp_pdip
from quad_periodic_mpc_tpu.ops.qp_admm import QPData
from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat, rpy_to_quat

N_DOF = 18


@dataclasses.dataclass(frozen=True)
class WBCGains:
    """Defaults from ros_dynamic_params.cfg:61-91 and WBC_Ctrl ctor."""

    kp_ori: tuple = (100.0, 100.0, 100.0)
    kd_ori: tuple = (10.0, 10.0, 10.0)
    kp_body: tuple = (100.0, 100.0, 100.0)
    kd_body: tuple = (10.0, 10.0, 10.0)
    kp_foot: tuple = (500.0, 500.0, 500.0)
    kd_foot: tuple = (10.0, 10.0, 10.0)
    kp_joint: tuple = (3.0, 3.0, 3.0)
    kd_joint: tuple = (1.0, 0.2, 0.2)
    w_floating: float = 0.1        # WBC_Ctrl.cpp:20
    w_rf: float = 1.0              # WBC_Ctrl.cpp:22
    mu: float = 0.4                # SingleContact.cpp:15
    max_fz: float = 1500.0         # SingleContact.cpp:7
    pinv_damping: float = 1e-4     # ~ KinWBC threshold_ 0.001 (SVD cutoff)
    # Faithful knee barrier (WBC_Ctrl.cpp:153-163).  NOTE: with the MIT
    # joint convention the knee angle is always < 0.3 in normal stance, so
    # the reference's barrier unconditionally clamps qDes[knee] to 0.3 and
    # replaces the knee feedforward with 1/(q^2+0.02) ~ 0.4-0.6 Nm.
    # Default False (dynamics-consistent output); enable for bit-level
    # reference parity.
    knee_barrier: bool = False


class WBCInput(NamedTuple):
    """LocomotionCtrlData (LocomotionCtrl.hpp)."""

    p_body_des: jnp.ndarray       # (..., 3)
    v_body_des: jnp.ndarray       # (..., 3)
    a_body_des: jnp.ndarray       # (..., 3)
    rpy_des: jnp.ndarray          # (..., 3)
    omega_des: jnp.ndarray        # (..., 3)
    p_foot_des: jnp.ndarray       # (..., 4, 3)
    v_foot_des: jnp.ndarray       # (..., 4, 3)
    a_foot_des: jnp.ndarray       # (..., 4, 3)
    fr_des: jnp.ndarray           # (..., 4, 3) MPC reaction forces
    contact_state: jnp.ndarray    # (..., 4) > 0 = stance


class WBCOutput(NamedTuple):
    tau_ff: jnp.ndarray           # (..., 4, 3)
    q_des: jnp.ndarray            # (..., 4, 3)
    qd_des: jnp.ndarray           # (..., 4, 3)
    kp_joint: jnp.ndarray         # (3,)
    kd_joint: jnp.ndarray         # (3,)
    fr: jnp.ndarray               # (..., 4, 3) solved reaction forces


def _damped_pinv(J: jnp.ndarray, damping: float) -> jnp.ndarray:
    """J^+ = J^T (J J^T + lam I)^{-1} — damped stand-in for the
    SVD-threshold pseudoInverse (KinWBC.cpp:97-101); zero rows (masked
    tasks) drop out exactly."""
    m = J.shape[-2]
    JJt = J @ jnp.swapaxes(J, -1, -2) + damping * jnp.eye(m, dtype=J.dtype)
    # linalg.spd_inverse: XLA's tiny batched LU is the TPU pathology
    return jnp.swapaxes(J, -1, -2) @ linalg.spd_inverse(JJt)


def _weighted_pinv(J: jnp.ndarray, Ainv: jnp.ndarray, damping: float) -> jnp.ndarray:
    """Dynamically consistent inverse Jbar = Ainv J^T (J Ainv J^T)^{-1}
    (WBC::_WeightedInverse)."""
    m = J.shape[-2]
    AiJt = Ainv @ jnp.swapaxes(J, -1, -2)
    JAiJt = J @ AiJt + damping * jnp.eye(m, dtype=J.dtype)
    return AiJt @ linalg.spd_inverse(JAiJt)


def _cone_block(mu: float, dtype) -> jnp.ndarray:
    """The 6x3 WBIC friction block Uf (SingleContact.cpp:17-29):
    rows [fz; fx+mu fz; -fx+mu fz; fy+mu fz; -fy+mu fz; -fz]."""
    return jnp.asarray(
        [
            [0.0, 0.0, 1.0],
            [1.0, 0.0, mu],
            [-1.0, 0.0, mu],
            [0.0, 1.0, mu],
            [0.0, -1.0, mu],
            [0.0, 0.0, -1.0],
        ],
        dtype,
    )


def _build_tasks(
    state: fb.FBState,
    contact: fb.ContactInfo,
    inp: WBCInput,
    gains: WBCGains,
    dtype,
):
    """Task Jacobians (..., 6, 3, 18), kin errors, desired vel/acc commands.

    Order: [body ori, body pos, foot0..3] (LocomotionCtrl.cpp:52-92);
    foot tasks are masked (zeroed) for stance legs.
    """
    batch = state.pos.shape[:-1]
    R = quat_to_rotmat(state.quat)               # body -> world

    # --- body orientation task (BodyOriTask.cpp) ---
    quat_des = rpy_to_quat(inp.rpy_des)
    q = state.quat
    q_inv = q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype)
    from quad_periodic_mpc_tpu.estimation.orientation import quat_product

    ori_err_q = quat_product(quat_des, q_inv)
    ori_err_q = jnp.where(ori_err_q[..., 0:1] < 0, -ori_err_q, ori_err_q)
    # quaternionToso3: 2 * w-normalized vector part * ... reference
    # ori::quaternionToso3: so3 = 2 * q.tail * ... use 2*sign*vec (small
    # angle): so3 = 2 * vec * atan2(|vec|, w)/|vec| — for small errors
    # ~ 2*vec; use exact form:
    vec = ori_err_q[..., 1:4]
    vn = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn, ori_err_q[..., 0:1])
    so3 = jnp.where(vn > 1e-9, vec / jnp.maximum(vn, 1e-12) * angle, 2.0 * vec)

    omega_body = state.v_body[..., 0:3]
    vel_err_ori = jnp.einsum(
        "...ij,...j->...i", R, inp.omega_des - omega_body
    )
    kp_o = jnp.asarray(gains.kp_ori, dtype)
    kd_o = jnp.asarray(gains.kd_ori, dtype)
    cmd_ori = kp_o * so3 + kd_o * vel_err_ori
    J_ori = jnp.zeros(batch + (3, N_DOF), dtype)
    J_ori = J_ori.at[..., :, 0:3].set(R)
    err_ori = so3                                  # Kp_kin = 1

    # --- body position task (BodyPosTask.cpp) ---
    v_world = jnp.einsum("...ij,...j->...i", R, state.v_body[..., 3:6])
    pos_err = inp.p_body_des - state.pos
    kp_b = jnp.asarray(gains.kp_body, dtype)
    kd_b = jnp.asarray(gains.kd_body, dtype)
    cmd_pos = kp_b * pos_err + kd_b * (inp.v_body_des - v_world) + inp.a_body_des
    J_pos = jnp.zeros(batch + (3, N_DOF), dtype)
    J_pos = J_pos.at[..., :, 3:6].set(R)
    err_pos = pos_err

    # --- foot tasks (LinkPosTask.cpp), masked for stance legs ---
    swing = (inp.contact_state <= 0.0).astype(dtype)     # (..., 4)
    v_feet = jnp.einsum("...kij,...j->...ki", contact.Jc, _gen_vel(state))
    kp_f = jnp.asarray(gains.kp_foot, dtype)
    kd_f = jnp.asarray(gains.kd_foot, dtype)
    foot_err = (inp.p_foot_des - contact.p_foot) * swing[..., None]
    cmd_foot = (
        kp_f * (inp.p_foot_des - contact.p_foot)
        + kd_f * (inp.v_foot_des - v_feet)
        + inp.a_foot_des
    ) * swing[..., None]
    J_feet = contact.Jc * swing[..., None, None]
    Jdqd_feet = contact.Jcdqd * swing[..., None]

    jacobians = [J_ori, J_pos] + [J_feet[..., k, :, :] for k in range(4)]
    errors = [err_ori, err_pos] + [foot_err[..., k, :] for k in range(4)]
    vels = [inp.omega_des, inp.v_body_des] + [
        (inp.v_foot_des * swing[..., None])[..., k, :] for k in range(4)
    ]
    cmds = [cmd_ori, cmd_pos] + [cmd_foot[..., k, :] for k in range(4)]
    jdqd = [jnp.zeros_like(err_ori), jnp.zeros_like(err_pos)] + [
        Jdqd_feet[..., k, :] for k in range(4)
    ]
    return jacobians, errors, vels, cmds, jdqd


def _gen_vel(state: fb.FBState) -> jnp.ndarray:
    return jnp.concatenate([state.v_body, state.qd], axis=-1)


def kin_wbc(
    state: fb.FBState,
    Jc_masked: jnp.ndarray,
    jacobians, errors, vels,
    gains: WBCGains,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """KinWBC::FindConfiguration (KinWBC.cpp:16-90).

    Returns (des_jpos (..., 12), des_jvel (..., 12)).
    """
    dtype = state.pos.dtype
    batch = state.pos.shape[:-1]
    eye = jnp.eye(N_DOF, dtype=dtype)

    # accepts (..., 4, 3, 18) point contacts or any pre-flattened
    # (..., m, 18) contact Jacobian (e.g. the 6-row FixedBodyContact)
    Jc_flat = Jc_masked.reshape(batch + (-1, N_DOF))
    Jc_pinv = _damped_pinv(Jc_flat, gains.pinv_damping)
    Nc = eye - Jc_pinv @ Jc_flat

    Jt = jacobians[0]
    JtPre = Jt @ Nc
    JtPre_pinv = _damped_pinv(JtPre, gains.pinv_damping)
    delta_q = jnp.einsum("...ij,...j->...i", JtPre_pinv, errors[0])
    qdot = jnp.einsum("...ij,...j->...i", JtPre_pinv, vels[0])
    N_pre = Nc @ (eye - JtPre_pinv @ JtPre)

    for i in range(1, len(jacobians)):
        Jt = jacobians[i]
        JtPre = Jt @ N_pre
        JtPre_pinv = _damped_pinv(JtPre, gains.pinv_damping)
        delta_q = delta_q + jnp.einsum(
            "...ij,...j->...i", JtPre_pinv,
            errors[i] - jnp.einsum("...ij,...j->...i", Jt, delta_q),
        )
        qdot = qdot + jnp.einsum(
            "...ij,...j->...i", JtPre_pinv,
            vels[i] - jnp.einsum("...ij,...j->...i", Jt, qdot),
        )
        N_pre = N_pre @ (eye - JtPre_pinv @ JtPre)

    des_jpos = state.q + delta_q[..., 6:]
    des_jvel = qdot[..., 6:]
    return des_jpos, des_jvel


def wbic(
    state: fb.FBState,
    A: jnp.ndarray,
    Ainv: jnp.ndarray,
    cori: jnp.ndarray,
    grav: jnp.ndarray,
    Jc_masked: jnp.ndarray,
    Jcdqd_masked: jnp.ndarray,
    jacobians, cmds, jdqd,
    fr_des_masked: jnp.ndarray,
    contact_mask: jnp.ndarray,
    gains: WBCGains,
    pdip: PDIPConfig = PDIPConfig(iterations=20, kkt="spd"),
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """WBIC::MakeTorque (WBIC.cpp:17-135).

    Returns (tau (..., 12), Fr (..., 12), qddot (..., 18)).
    """
    dtype = state.pos.dtype
    batch = state.pos.shape[:-1]
    eye = jnp.eye(N_DOF, dtype=dtype)

    Jc = Jc_masked.reshape(batch + (-1, N_DOF))
    Jcdqd = Jcdqd_masked.reshape(batch + (-1,))
    JcBar = _weighted_pinv(Jc, Ainv, gains.pinv_damping)
    qddot = jnp.einsum("...ij,...j->...i", JcBar, -Jcdqd)
    Npre = eye - JcBar @ Jc

    for i in range(len(jacobians)):
        Jt = jacobians[i]
        JtPre = Jt @ Npre
        JtBar = _weighted_pinv(JtPre, Ainv, gains.pinv_damping)
        qddot = qddot + jnp.einsum(
            "...ij,...j->...i", JtBar,
            cmds[i] - jdqd[i] - jnp.einsum("...ij,...j->...i", Jt, qddot),
        )
        Npre = Npre @ (eye - JtBar @ JtPre)

    # ---- relaxation QP ----
    # variables z = [d_qddot_float(6); dF(12)], cost diag(Wf, Wrf)
    # equality (6): A_ff z_f - (Sv Jc^T) dF = -Sv (A qddot + b - Jc^T Fr_des)
    # inequality: Uf (Fr_des + dF) >= ieq  (only dF) — eliminate z_f:
    #   z_f = A_ff^{-1} (r + Jc_f^T dF),  r = -(A qddot + b - Jc^T Fr_des)[0:6]
    fr_des = fr_des_masked.reshape(batch + (12,))
    b_vec = cori + grav
    resid = -(
        jnp.einsum("...ij,...j->...i", A, qddot)
        + b_vec
        - jnp.einsum("...ji,...j->...i", Jc, fr_des)
    )[..., 0:6]
    A_ff = A[..., 0:6, 0:6]
    A_ff_inv = linalg.spd_inverse(A_ff)
    JcfT = jnp.swapaxes(Jc, -1, -2)[..., 0:6, :]     # (..., 6, 12)

    # z_f(dF) = A_ff_inv (resid + JcfT dF) = z0 + M dF
    z0 = jnp.einsum("...ij,...j->...i", A_ff_inv, resid)
    Mmat = A_ff_inv @ JcfT                            # (..., 6, 12)

    # cost: Wf |z0 + M dF|^2 + Wrf |dF|^2
    wf = jnp.asarray(gains.w_floating, dtype)
    wrf = jnp.asarray(gains.w_rf, dtype)
    P = 2.0 * (
        wf * jnp.swapaxes(Mmat, -1, -2) @ Mmat
        + wrf * jnp.eye(12, dtype=dtype)
    )
    q_lin = 2.0 * wf * jnp.einsum("...ji,...j->...i", Mmat, z0)

    # cone inequality on F = fr_des + dF: Uf F >= ieq; swing feet get
    # fz_max = 0 which pins F = 0 (exact swing elimination)
    Uf = _cone_block(gains.mu, dtype)
    fz_max = jnp.asarray(gains.max_fz, dtype) * contact_mask   # (..., 4)
    ieq = jnp.zeros(batch + (4, 6), dtype).at[..., 5].set(-fz_max)
    # bounds on s = Uf F: l = ieq, u = big
    from quad_periodic_mpc_tpu.ops import constraints as con

    uf_frdes = con.apply(Uf, fr_des)                  # (..., 24)
    l = ieq.reshape(batch + (24,)) - uf_frdes
    u = jnp.full_like(l, 1e4)

    qp = QPData(P=P, q=q_lin, F=Uf, l=l, u=u)
    dF, _ = qp_pdip.solve(qp, pdip)

    fr = fr_des + dF
    z_f = z0 + jnp.einsum("...ij,...j->...i", Mmat, dF)
    qddot_final = qddot.at[..., 0:6].add(z_f)

    tau_full = (
        jnp.einsum("...ij,...j->...i", A, qddot_final)
        + b_vec
        - jnp.einsum("...ji,...j->...i", Jc, fr)
    )
    return tau_full[..., 6:], fr, qddot_final


def run(
    state: fb.FBState,
    inp: WBCInput,
    mc: fb.ModelConstants,
    gains: WBCGains = WBCGains(),
    pdip: PDIPConfig = PDIPConfig(iterations=20, kkt="spd"),
    model=None,
    backend: str = "xla",
) -> WBCOutput:
    """Full WBC step (WBC_Ctrl::run, WBC_Ctrl.cpp:71-116).

    model: optional precomputed (A, Ainv, grav, cori, contact) for the
    SAME state — the full-stack tick computes these once and shares
    them between the WBC and the plant's substep cache
    (articulated_sim.model_cache); None computes fresh.

    backend: "xla" runs the batched spd_inverse/PDIP composition below;
    "pallas" dispatches the fused VMEM-resident lane-major kernel
    (ops/pallas/wbc_kernel.py — the production full-stack path; f32
    only, outputs match to f32 tolerance, tests/test_wbc_kernel.py)."""
    dtype = state.pos.dtype
    if model is None:
        A = fb.mass_matrix(state, mc)
        grav = fb.generalized_gravity(state, mc)
        cori = fb.generalized_coriolis(state, mc)
        Ainv = linalg.spd_inverse(A)   # 18x18 SPD mass matrix
        contact = fb.contact_jacobians(state, mc)
    else:
        A, Ainv, grav, cori, contact = model

    contact_mask = (inp.contact_state > 0.0).astype(dtype)
    Jc_masked = contact.Jc * contact_mask[..., None, None]
    Jcdqd_masked = contact.Jcdqd * contact_mask[..., None]
    fr_des_masked = inp.fr_des * contact_mask[..., None]

    jacobians, errors, vels, cmds, jdqd = _build_tasks(
        state, contact, inp, gains, dtype
    )

    if backend == "pallas" and dtype == jnp.float32:
        import jax

        from quad_periodic_mpc_tpu.ops.pallas import wbc_kernel

        lead = state.pos.shape[:-1]
        B = 1
        for d in lead:
            B *= d
        R = quat_to_rotmat(state.quat)
        stack6 = lambda parts: jnp.concatenate(
            [p.reshape((B, 3)) for p in parts], axis=-1
        )
        des_jpos, des_jvel, tau, fr = wbc_kernel.fused_wbc(
            A.reshape(B, N_DOF, N_DOF), Ainv.reshape(B, N_DOF, N_DOF),
            (cori + grav).reshape(B, N_DOF),
            contact.Jc.reshape(B, 12, N_DOF),
            contact.Jcdqd.reshape(B, 12),
            contact_mask.reshape(B, 4), R.reshape(B, 3, 3),
            stack6(errors), stack6(vels), stack6(cmds), stack6(jdqd),
            fr_des_masked.reshape(B, 12), state.q.reshape(B, 12),
            damping=gains.pinv_damping, w_floating=gains.w_floating,
            w_rf=gains.w_rf, mu=gains.mu, max_fz=gains.max_fz,
            pdip_iters=pdip.iterations, pdip_reg=pdip.reg,
            pdip_tau=pdip.tau, pdip_mu_min=pdip.mu_min,
            pdip_slack_floor=pdip.slack_floor,
            pdip_big_clamp=pdip.big_clamp,
            interpret=jax.default_backend() == "cpu",
        )
        des_jpos = des_jpos.reshape(lead + (12,))
        des_jvel = des_jvel.reshape(lead + (12,))
        tau = tau.reshape(lead + (12,))
        fr = fr.reshape(lead + (12,))
    else:
        des_jpos, des_jvel = kin_wbc(
            state, Jc_masked, jacobians, errors, vels, gains
        )
        tau, fr, _ = wbic(
            state, A, Ainv, cori, grav, Jc_masked, Jcdqd_masked,
            jacobians, cmds, jdqd, fr_des_masked, contact_mask, gains,
            pdip,
        )

    q_des = des_jpos.reshape(des_jpos.shape[:-1] + (4, 3))
    qd_des = des_jvel.reshape(des_jvel.shape[:-1] + (4, 3))
    tau_ff = tau.reshape(tau.shape[:-1] + (4, 3))

    # knee barrier (WBC_Ctrl::_UpdateLegCMD, WBC_Ctrl.cpp:153-163)
    if gains.knee_barrier:
        q_des = q_des.at[..., 2].set(jnp.maximum(q_des[..., 2], 0.3))
        knee = state.q.reshape(state.q.shape[:-1] + (4, 3))[..., 2]
        barrier = 1.0 / (knee * knee + 0.02)
        tau_ff = tau_ff.at[..., 2].set(
            jnp.where(knee < 0.3, barrier, tau_ff[..., 2])
        )

    return WBCOutput(
        tau_ff=tau_ff,
        q_des=q_des,
        qd_des=qd_des,
        kp_joint=jnp.asarray(gains.kp_joint, dtype),
        kd_joint=jnp.asarray(gains.kd_joint, dtype),
        fr=fr.reshape(fr.shape[:-1] + (4, 3)),
    )
