"""Full-stack torque-level closed loop: MPC + WBC + LegController on the
articulated plant.

This composes the entire reference control pipeline
(Body_Manager::run -> ControlFSM -> FSM_State_Locomotion ->
ConvexMPCLocomotion + WBC_Ctrl -> LegController -> plant;
SURVEY.md sections 3.2-3.4) against the 18-DoF articulated simulator —
the rebuild's analog of the RaiSim integration test, at torque level:

  per control tick (500 Hz):
    cheater state estimate from the plant
    [every 13th tick] mpc_step          (38.5 Hz convex MPC)
    swing_update                         (foot targets, gait phases)
    wbc.run                              (KinWBC + WBIC)
    leg_controller.torque_output         (joint PD + tau_ff)
    articulated_sim.step x substeps      (plant @ 10 kHz)

Fully batched; jax.lax.scan over MPC periods.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import (
    ADMMConfig, EstimatorConfig, LoopConfig, MPCConfig, PDIPConfig,
    SwingConfig,
)
from quad_periodic_mpc_tpu.control import leg_controller as lc
from quad_periodic_mpc_tpu.control import mpc as mpc_mod
from quad_periodic_mpc_tpu.control import wbc as wbc_mod
from quad_periodic_mpc_tpu.models import floating_base as fb
from quad_periodic_mpc_tpu.models.a1 import A1, RobotModel
from quad_periodic_mpc_tpu.ops import gait as gait_ops
from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat, quat_to_rpy
from quad_periodic_mpc_tpu.sim import articulated_sim as art


class FullStackCarry(NamedTuple):
    plant: art.ArtState
    ctrl: mpc_mod.ControllerState


def observe_plant(plant: art.ArtState, mc: fb.ModelConstants,
                  kin_backend: str = "xla"):
    """Cheater estimate from the articulated plant (cheater_mode path).

    kin_backend="pallas" computes the contact kinematics (FK + foot
    Jacobians) in the fused lane-major kernel
    (ops/pallas/kinematics_kernel.py) — the b=1 tick's dominant
    XLA-op-count stage (~1.3 ms/tick, tools/probe_b1_split.py)."""
    s = plant.fb
    R = quat_to_rotmat(s.quat)
    if kin_backend == "pallas":
        import jax

        from quad_periodic_mpc_tpu.ops.pallas import kinematics_kernel

        info = kinematics_kernel.fused_contact_kinematics(
            s, mc, interpret=jax.default_backend() == "cpu"
        )
    else:
        info = fb.contact_jacobians(s, mc)
    v_world = jnp.einsum("...ij,...j->...i", R, s.v_body[..., 3:6])
    omega_world = jnp.einsum("...ij,...j->...i", R, s.v_body[..., 0:3])
    obs = mpc_mod.Observation(
        p=s.pos, v=v_world, quat=s.quat, omega=omega_world,
        p_feet=info.p_foot,
    )
    return obs, R, info


def controller_tick(
    plant: art.ArtState,
    ctrl: mpc_mod.ControllerState,
    cmd: mpc_mod.Command,
    gait: gait_ops.GaitParams,
    mc: fb.ModelConstants,
    do_mpc: bool,
    mpc_cfg: MPCConfig = MPCConfig(horizon=10),
    loop_cfg: LoopConfig = LoopConfig(),
    est_cfg: EstimatorConfig = EstimatorConfig(),
    solver=PDIPConfig(iterations=25),
    wbc_gains: wbc_mod.WBCGains = wbc_mod.WBCGains(),
    wbc_pdip: PDIPConfig = PDIPConfig(iterations=15),
    model: RobotModel = A1,
    swing_cfg: SwingConfig = SwingConfig(),
    use_wbc: bool = True,
    wbc_backend: str = "xla",
    kin_backend: str = "xla",
):
    """The CONTROLLER side of one 500 Hz tick: estimate -> (MPC every
    13th tick) -> swing targets -> WBC -> joint torques.

    This is the stream the reference's 2 ms budget constrains
    (be2r_cmpc_unitree.hpp:49) — the plant lives in a separate process
    there (raisim_unitree_ros_driver.cpp:309).  Split out so the bench
    can measure the controller stream's own latency (two-stream
    deployment shape) as well as the composed tick.

    Returns (ctrl', tau (..., 4, 3), model_terms) where model_terms =
    (A, Ainv, grav, cori, info) is the tick's one shared model
    evaluation (also consumed by the plant substep cache)."""
    # ONE model evaluation per tick, shared three ways: the WBC's
    # dynamics (A, A^{-1}, gravity, Coriolis, contact J), the
    # plant's substep cache (A^{-1}, G, C — articulated_sim.
    # model_cache contract), and the observation's foot kinematics.
    # kin_backend="pallas" runs the WHOLE evaluation (CRBA + rotors +
    # gravity + Coriolis + 18x18 inverse + contact kinematics) as ONE
    # fused kernel (ops/pallas/kinematics_kernel.fused_model_eval) —
    # at b=1 the XLA spatial-algebra chains are the composed tick's
    # largest op-dispatch cost (tools/probe_b1_split.py).
    if kin_backend == "pallas":
        import jax as _jax

        from quad_periodic_mpc_tpu.ops.pallas import kinematics_kernel

        A_t, Ainv_t, G_t, C_t, info = kinematics_kernel.fused_model_eval(
            plant.fb, mc, interpret=_jax.default_backend() == "cpu"
        )
        s = plant.fb
        R = quat_to_rotmat(s.quat)
        v_world = jnp.einsum("...ij,...j->...i", R, s.v_body[..., 3:6])
        omega_world = jnp.einsum("...ij,...j->...i", R, s.v_body[..., 0:3])
        obs = mpc_mod.Observation(
            p=s.pos, v=v_world, quat=s.quat, omega=omega_world,
            p_feet=info.p_foot,
        )
    else:
        obs, R, info = observe_plant(plant, mc)

        from quad_periodic_mpc_tpu.ops import linalg as _lin

        A_t = fb.mass_matrix(plant.fb, mc)
        Ainv_t = _lin.spd_inverse(A_t)
        G_t = fb.generalized_gravity(plant.fb, mc)
        C_t = fb.generalized_coriolis(plant.fb, mc)

    ctrl = mpc_mod.setup_command(ctrl, cmd, loop_cfg)
    if do_mpc:
        ctrl, _ = mpc_mod.mpc_step(
            ctrl, obs, cmd, gait, plant.t, mpc_cfg, loop_cfg, est_cfg,
            solver,
        )
    ctrl, out = mpc_mod.swing_update(
        ctrl, obs, cmd, gait, model, swing_cfg, mpc_cfg, loop_cfg,
        loop_cfg.swing_height,
    )

    if use_wbc:
        # WBC input (LocomotionCtrl handoff fields,
        # ConvexMPCLocomotion.cpp:465-501)
        rpy = quat_to_rpy(obs.quat)
        v_des_robot = jnp.stack(
            [ctrl.x_vel_des, ctrl.y_vel_des,
             jnp.zeros_like(ctrl.x_vel_des)], axis=-1,
        )
        v_des_world = jnp.einsum("...ij,...j->...i", R, v_des_robot)
        wpd = ctrl.world_position_desired
        p_body_des = jnp.concatenate(
            [wpd[..., 0:2], cmd.body_height[..., None]], axis=-1
        )
        rpy_des = jnp.stack(
            [jnp.zeros_like(cmd.yaw_rate), jnp.zeros_like(cmd.yaw_rate),
             ctrl.yaw_des], axis=-1,
        )
        omega_des = jnp.stack(
            [jnp.zeros_like(cmd.yaw_rate), jnp.zeros_like(cmd.yaw_rate),
             cmd.yaw_rate], axis=-1,
        )
        winp = wbc_mod.WBCInput(
            p_body_des=p_body_des,
            v_body_des=v_des_world,
            a_body_des=jnp.zeros_like(v_des_world),
            rpy_des=rpy_des,
            omega_des=omega_des,
            p_foot_des=out.p_foot_des,
            v_foot_des=out.v_foot_des,
            a_foot_des=out.a_foot_des,
            fr_des=out.fr_des,
            contact_state=out.contact_state,
        )
        wout = wbc_mod.run(
            plant.fb, winp, mc, gains=wbc_gains, pdip=wbc_pdip,
            model=(A_t, Ainv_t, G_t, C_t, info),
            backend=wbc_backend,
        )
        q = plant.fb.q.reshape(plant.fb.q.shape[:-1] + (4, 3))
        qd = plant.fb.qd.reshape(q.shape)
        tau = (
            wout.tau_ff
            + wout.kp_joint * (wout.q_des - q)
            + wout.kd_joint * (wout.qd_des - qd)
        )
    else:
        # MPC-only stance force path + swing cartesian PD
        data = lc.update_data(
            plant.fb.q.reshape(plant.fb.q.shape[:-1] + (4, 3)),
            plant.fb.qd.reshape(plant.fb.q.shape[:-1] + (4, 3)),
            model,
        )
        hips = jnp.asarray(model.hip_locations(), obs.p.dtype)
        p_des_leg = jnp.einsum(
            "...ji,...kj->...ki", R, out.p_foot_des - obs.p[..., None, :]
        ) - hips
        v_des_leg = jnp.einsum(
            "...ji,...kj->...ki", R,
            out.v_foot_des - obs.v[..., None, :],
        )
        f_body = jnp.einsum("...ji,...kj->...ki", R, out.fr_des)
        stance = (out.swing_state <= 0)[..., None]
        leg_cmd = lc.LegCommand.zeros(
            obs.p.shape[:-1], obs.p.dtype
        )._replace(
            force_ff=jnp.where(stance, -f_body, 0.0),
            p_des=p_des_leg, v_des=v_des_leg,
            q_des=data.q, qd_des=jnp.zeros_like(data.qd),
            kp_cartesian=jnp.where(stance, 120.0, 400.0)
            * jnp.ones_like(p_des_leg),
            kd_cartesian=jnp.full_like(p_des_leg, 10.0),
            kd_joint=jnp.full_like(p_des_leg, 1.0),
        )
        tau = lc.torque_output(
            cmd=leg_cmd, data=data, model=model, flip_signs=False
        )

    return ctrl, tau, (A_t, Ainv_t, G_t, C_t, info)


def rollout_articulated(
    n_mpc_steps: int,
    plant: art.ArtState,
    ctrl: mpc_mod.ControllerState,
    cmd: mpc_mod.Command,
    gait: gait_ops.GaitParams,
    mc: fb.ModelConstants,
    mpc_cfg: MPCConfig = MPCConfig(horizon=10),
    loop_cfg: LoopConfig = LoopConfig(),
    est_cfg: EstimatorConfig = EstimatorConfig(),
    solver=PDIPConfig(iterations=25),
    wbc_gains: wbc_mod.WBCGains = wbc_mod.WBCGains(),
    wbc_pdip: PDIPConfig = PDIPConfig(iterations=15),
    model: RobotModel = A1,
    swing_cfg: SwingConfig = SwingConfig(),
    contact: art.ContactParams = art.ContactParams(),
    substeps: int = 10,
    use_wbc: bool = True,
    wbc_backend: str = "xla",
    kin_backend: str = "xla",
) -> tuple[FullStackCarry, dict]:
    """Run n_mpc_steps MPC periods of the full torque-level stack."""
    sub_dt = loop_cfg.dt / substeps

    def control_tick(carry: FullStackCarry, do_mpc: bool):
        plant, ctrl = carry
        ctrl, tau, (A_t, Ainv_t, G_t, C_t, info) = controller_tick(
            plant, ctrl, cmd, gait, mc, do_mpc,
            mpc_cfg=mpc_cfg, loop_cfg=loop_cfg, est_cfg=est_cfg,
            solver=solver, wbc_gains=wbc_gains, wbc_pdip=wbc_pdip,
            model=model, swing_cfg=swing_cfg, use_wbc=use_wbc,
            wbc_backend=wbc_backend, kin_backend=kin_backend,
        )

        # plant substeps reuse the tick's model terms (art.model_cache
        # contract: inertia on the 2 ms scale) AND the tick's contact
        # kinematics (step_fast: frozen Jc + integrated foot positions —
        # the FK chain is the dominant substep cost; round 5).  The
        # fused-tick configuration (kin_backend="pallas") runs ALL
        # `substeps` in one kernel dispatch (ops/pallas/plant_kernel).
        cache = (Ainv_t, G_t, C_t)

        if kin_backend == "pallas":
            import jax as _jax

            from quad_periodic_mpc_tpu.ops.pallas import plant_kernel

            plant, _ = plant_kernel.fused_substeps(
                plant, tau, sub_dt, contact, cache, info.Jc,
                info.p_foot, substeps,
                interpret=_jax.default_backend() == "cpu",
            )
        else:
            def sub(c, _):
                p, pf = c
                p2, pf2, _ = art.step_fast(
                    p, tau, sub_dt, contact, cache, info.Jc, pf
                )
                return (p2, pf2), None

            (plant, _), _ = jax.lax.scan(
                sub, (plant, info.p_foot), None, length=substeps
            )
        return FullStackCarry(plant, ctrl)

    def mpc_period(carry, _):
        carry = control_tick(carry, do_mpc=True)

        def inner(c, _):
            return control_tick(c, do_mpc=False), None

        carry, _ = jax.lax.scan(
            inner, carry, None, length=loop_cfg.iterations_between_mpc - 1
        )
        trace = {
            "pos": carry.plant.fb.pos,
            "quat": carry.plant.fb.quat,
            "v_body": carry.plant.fb.v_body,
        }
        return carry, trace

    carry = FullStackCarry(plant, ctrl)
    carry, traces = jax.lax.scan(mpc_period, carry, None, length=n_mpc_steps)
    return carry, traces
