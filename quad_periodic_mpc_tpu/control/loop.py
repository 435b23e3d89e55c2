"""Closed-loop rollout: controller + SRB plant under jax.lax.scan.

The TPU equivalent of the reference's 500 Hz process loop
(Body_Manager::run, be2r_cmpc_unitree.cpp:263-327) against RaiSim: an
outer scan over MPC periods, an inner scan over the
iterations_between_mpc control ticks (FSM_State_Locomotion.cpp:13).
Fully batched — a leading batch axis on all states rolls out thousands of
scenarios in lockstep.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import (
    ADMMConfig,
    EstimatorConfig,
    LoopConfig,
    MPCConfig,
    PDIPConfig,
    SwingConfig,
)
from quad_periodic_mpc_tpu.control import mpc as mpc_ctrl
from quad_periodic_mpc_tpu.models.a1 import RobotModel, A1
from quad_periodic_mpc_tpu.ops import gait as gait_ops
from quad_periodic_mpc_tpu.sim import srb_sim


class RolloutCarry(NamedTuple):
    plant: srb_sim.PlantState
    ctrl: mpc_ctrl.ControllerState


class TickBalanceGains(NamedTuple):
    """Per-tick stance-force correction gains (the SRB-tier analog of the
    500 Hz WBC layer, WBC_Ctrl.cpp:60-205: between 38.5 Hz MPC solves the
    reference re-stabilizes attitude/height every control tick; without
    it, laterally-paired gaits like pacing are roll-unstable over a 13-
    tick zero-order hold).  A PD wrench on the tracking error is mapped
    to stance-foot force deltas through the ridge-regularized grasp map
    — one batched 6x6 solve per tick."""

    kp_ori: tuple = (150.0, 120.0, 40.0)   # N*m/rad roll, pitch, yaw
    kd_ori: tuple = (20.0, 15.0, 8.0)      # N*m*s/rad
    kp_pos: tuple = (0.0, 60.0, 600.0)     # N/m  (x left to MPC)
    kd_pos: tuple = (20.0, 20.0, 60.0)     # N*s/m
    ridge: float = 1e-2


def _tick_balance_correction(
    gains: TickBalanceGains,
    obs: mpc_ctrl.Observation,
    ctrl: mpc_ctrl.ControllerState,
    cmd: mpc_ctrl.Command,
    stance: jnp.ndarray,          # (..., 4)
    f_mpc: jnp.ndarray,           # (..., 4, 3) world MPC forces
    mpc_cfg: MPCConfig,
) -> jnp.ndarray:
    """Stance-force delta from the PD wrench via the masked grasp map."""
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rpy

    dtype = f_mpc.dtype
    rpy = quat_to_rpy(obs.quat)
    yaw = rpy[..., 2]
    # desired: flat attitude at the integrated yaw, commanded height/vel
    yaw_err = ctrl.yaw_des - yaw
    yaw_err = jnp.arctan2(jnp.sin(yaw_err), jnp.cos(yaw_err))
    e_ori = jnp.stack([-rpy[..., 0], -rpy[..., 1], yaw_err], axis=-1)
    w_des = jnp.stack(
        [jnp.zeros_like(yaw), jnp.zeros_like(yaw), cmd.yaw_rate], axis=-1
    )
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    v_des = jnp.stack(
        [ctrl.x_vel_des * cy - ctrl.y_vel_des * sy,
         ctrl.x_vel_des * sy + ctrl.y_vel_des * cy,
         jnp.zeros_like(yaw)], axis=-1,
    )
    p_des = ctrl.world_position_desired.at[..., 2].set(cmd.body_height)
    kp_o = jnp.asarray(gains.kp_ori, dtype)
    kd_o = jnp.asarray(gains.kd_ori, dtype)
    kp_p = jnp.asarray(gains.kp_pos, dtype)
    kd_p = jnp.asarray(gains.kd_pos, dtype)
    d_force = kp_p * (p_des - obs.p) + kd_p * (v_des - obs.v)
    d_torque = kp_o * e_ori + kd_o * (w_des - obs.omega)
    dw = jnp.concatenate([d_force, d_torque], axis=-1)     # (..., 6)

    # masked grasp map G (..., 6, 12): [I3; r_i x] per stance foot
    r = (obs.p_feet - obs.p[..., None, :]) * stance[..., None]
    eye = jnp.eye(3, dtype=dtype)
    m = stance[..., None, None] * eye                       # (..., 4, 3, 3)
    zeros = jnp.zeros_like(r[..., 0])
    rx = jnp.stack(
        [jnp.stack([zeros, -r[..., 2], r[..., 1]], -1),
         jnp.stack([r[..., 2], zeros, -r[..., 0]], -1),
         jnp.stack([-r[..., 1], r[..., 0], zeros], -1)], axis=-2,
    )                                                       # (..., 4, 3, 3)
    batch = r.shape[:-2]
    Gf = jnp.swapaxes(m, -3, -2).reshape(batch + (3, 12))   # force rows
    Gt = jnp.swapaxes(rx, -3, -2).reshape(batch + (3, 12))  # torque rows
    G = jnp.concatenate([Gf, Gt], axis=-2)                  # (..., 6, 12)

    GGt = jnp.einsum("...ik,...jk->...ij", G, G)
    A = GGt + gains.ridge * jnp.eye(6, dtype=dtype)
    lam = jnp.linalg.solve(A, dw[..., None])[..., 0]
    df = jnp.einsum("...ik,...i->...k", G, lam).reshape(f_mpc.shape)

    f = f_mpc + df
    # friction/cone clamp (SafetyChecker::checkForceFeedForward analog)
    fz = jnp.clip(f[..., 2], 0.0, mpc_cfg.f_max) * stance
    lim = mpc_cfg.mu * fz
    fx = jnp.clip(f[..., 0], -lim, lim)
    fy = jnp.clip(f[..., 1], -lim, lim)
    return jnp.stack([fx, fy, fz], axis=-1)


class TerrainLoopConfig(NamedTuple):
    """Terrain-in-the-loop settings (the CMPCLocomotion_Cv / VisionMPC
    tier): map-aware foothold selection + map body-height command.

    max_step_height cites MAX_STEP_HEIGHT = 0.17 (CMPC_Locomotion_cv.h:24);
    search radius 0.10 m cites _idxMapChecking (CMPC_Locomotion_cv.cpp:921).
    body_height_from_map raises the commanded body height by the mean map
    elevation under the feet — the map branch of _body_height_heuristics
    (CMPC_Locomotion_cv.cpp:885-891, z_offset from the smoothed plane at
    the robot center)."""

    search_radius_m: float = 0.10
    traversability_min: float = 0.8
    max_step_height: float = 0.17
    body_height_from_map: bool = True


class RolloutTrace(NamedTuple):
    """Per-MPC-step telemetry (LogData analog)."""

    x: jnp.ndarray            # (..., steps, 13) plant state
    forces: jnp.ndarray       # (..., steps, 4, 3) first-step MPC forces
    f_est: jnp.ndarray        # (..., steps, 6) estimated wrench
    est_freq: jnp.ndarray     # (..., steps)
    est_amp: jnp.ndarray      # (..., steps)


def rollout(
    n_mpc_steps: int,
    plant: srb_sim.PlantState,
    ctrl: mpc_ctrl.ControllerState,
    cmd: mpc_ctrl.Command,
    gait: gait_ops.GaitParams,
    dist: srb_sim.DisturbanceParams,
    mpc_cfg: MPCConfig,
    loop_cfg: LoopConfig,
    est_cfg: EstimatorConfig,
    solver: ADMMConfig | PDIPConfig,
    model: RobotModel = A1,
    swing_cfg: SwingConfig = SwingConfig(),
    tick_balance: TickBalanceGains | None = None,
    heightmap=None,
    ground_fn=None,
    terrain_cfg: TerrainLoopConfig = TerrainLoopConfig(),
    tunable=None,
) -> tuple[RolloutCarry, RolloutTrace]:
    """Run n_mpc_steps MPC periods (each = iterations_between_mpc ticks).

    With `tick_balance`, stance forces get a per-tick PD wrench correction
    between MPC solves (see TickBalanceGains) — required for gaits whose
    support polygon degenerates to a line (pacing) or to flight phases
    (trot_running), exactly the cases the reference cannot run MPC-only
    either (it always layers WBC at 500 Hz, FSM_State_Locomotion.cpp:267).

    Terrain tier (the CMPCLocomotion_Cv / VisionMPC closed loop):
    `heightmap` switches on map-aware foothold selection (full
    _updateFoothold semantics via control.cmpc_variant.foothold_update)
    and, per terrain_cfg, a map-derived body-height command; `ground_fn`
    (xy -> z) gives the plant the true surface so terrain-blind swing
    targets strike risers early.  Both batch: a (B, H, W) heightmap runs
    B terrain scenarios in lockstep (the sweep's terrain axis).

    tunable: optional TunableParams pytree threaded to mpc_step /
    swing_update — a TRACED argument, so re-invoking a jitted rollout
    chunk with new values retunes live without recompiling (the
    dynamic_reconfigure tier; see utils/live_tune.py + `cli live`).
    """
    if heightmap is not None:
        from quad_periodic_mpc_tpu.control import cmpc_variant as cv
        from quad_periodic_mpc_tpu.terrain import heightmap as hmap

        def _foothold_adjust(pf_target, state, obs):
            p0 = jnp.where(
                state.first_swing[..., None], obs.p_feet, state.swing_p0
            )
            return cv.foothold_update(
                heightmap, pf_target, p0,
                search_radius_m=terrain_cfg.search_radius_m,
                traversability_min=terrain_cfg.traversability_min,
                max_step_height=terrain_cfg.max_step_height,
            )
    else:
        _foothold_adjust = None

    def _terrain_cmd(obs):
        if heightmap is None or not terrain_cfg.body_height_from_map:
            return cmd
        from quad_periodic_mpc_tpu.terrain import heightmap as hmap

        # per-foot lookup: expand the map center against the foot axis
        hm_feet = heightmap._replace(
            center=heightmap.center[..., None, :]
        )
        idx = hmap.world_to_index(hm_feet, obs.p_feet[..., 0:2])
        z_feet = hmap.sample(heightmap.elevation, idx)       # (..., 4)
        z_ground = jnp.mean(z_feet, axis=-1)
        return cmd._replace(body_height=cmd.body_height + z_ground)

    def control_tick(carry: RolloutCarry, do_mpc: bool):
        plant, ctrl = carry
        obs = srb_sim.observe(plant)
        cmd_t = _terrain_cmd(obs)

        ctrl = mpc_ctrl.setup_command(ctrl, cmd_t, loop_cfg)
        if do_mpc:
            ctrl, _ = mpc_ctrl.mpc_step(
                ctrl, obs, cmd_t, gait, plant.t, mpc_cfg, loop_cfg, est_cfg,
                solver, tunable=tunable,
            )
        ctrl, out = mpc_ctrl.swing_update(
            ctrl, obs, cmd_t, gait, model, swing_cfg, mpc_cfg, loop_cfg,
            loop_cfg.swing_height, tunable=tunable,
            foothold_adjust=_foothold_adjust,
        )
        stance = (out.swing_state <= 0).astype(plant.x.dtype)
        forces = out.fr_des
        if tick_balance is not None:
            forces = _tick_balance_correction(
                tick_balance, obs, ctrl, cmd_t, stance, forces, mpc_cfg
            )
        plant = srb_sim.step(
            plant, forces, out.p_foot_des, stance, dist, mpc_cfg,
            loop_cfg.dt, ground_fn=ground_fn,
        )
        return RolloutCarry(plant, ctrl)

    def mpc_period(carry: RolloutCarry, _):
        carry = control_tick(carry, do_mpc=True)

        def inner(c, _):
            return control_tick(c, do_mpc=False), None

        carry, _ = jax.lax.scan(
            inner, carry, None, length=loop_cfg.iterations_between_mpc - 1
        )
        trace = RolloutTrace(
            x=carry.plant.x,
            forces=carry.ctrl.fr_des,
            f_est=carry.ctrl.est.f_est,
            est_freq=carry.ctrl.est.est_freq,
            est_amp=carry.ctrl.est.est_amp,
        )
        return carry, trace

    carry = RolloutCarry(plant, ctrl)
    carry, traces = jax.lax.scan(mpc_period, carry, None, length=n_mpc_steps)
    # scan stacks on axis 0; move steps after batch axes
    batch_ndim = plant.t.ndim
    traces = jax.tree.map(lambda a: jnp.moveaxis(a, 0, batch_ndim), traces)
    return carry, traces
