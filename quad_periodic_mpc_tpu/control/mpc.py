"""Convex-MPC locomotion driver — the ConvexMPCLocomotion rebuild.

Maps the reference's mutable controller object
(src/controllers/convexMPC/ConvexMPCLocomotion.cpp) onto a pure
state-transition function:

    (ControllerState, Observation, Command) -> (ControllerState, Output)

split at the reference's own cadence boundary:

- ``mpc_step``   — runs once per MPC tick (every 13 control ticks /
  38.5 Hz, FSM_State_Locomotion.cpp:13): reference-trajectory build
  (ConvexMPCLocomotion.cpp:511-600), disturbance residual + periodic
  estimator, QP assembly + batched solve, force extraction f_ff = -R f
  (ConvexMPCLocomotion.cpp:832-845).  This is the hot benchmark kernel.

- ``swing_update`` — per-control-tick swing bookkeeping and foot targets
  (ConvexMPCLocomotion.cpp:277-460), vectorized over legs.

Everything is batched: a leading batch axis on ControllerState /
Observation / Command runs thousands of MPC instances (gait x phase x
disturbance hypothesis x scenario) in one call.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import (
    ADMMConfig,
    EstimatorConfig,
    LoopConfig,
    MPCConfig,
    PDIPConfig,
    SwingConfig,
    TunableParams,
)
from quad_periodic_mpc_tpu.models import srb
from quad_periodic_mpc_tpu.models.a1 import RobotModel
from quad_periodic_mpc_tpu.ops import estimator as est_ops
from quad_periodic_mpc_tpu.ops import gait as gait_ops
from quad_periodic_mpc_tpu.ops import problem, qp_admm, qp_pdip, swing
from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat, quat_to_rpy


class Observation(NamedTuple):
    """Estimated robot state at the control tick (StateEstimate analog)."""

    p: jnp.ndarray        # (..., 3) CoM position, world
    v: jnp.ndarray        # (..., 3) CoM velocity, world
    quat: jnp.ndarray     # (..., 4) orientation wxyz
    omega: jnp.ndarray    # (..., 3) angular velocity, world
    p_feet: jnp.ndarray   # (..., 4, 3) foot positions, world


class Command(NamedTuple):
    """Operator command (gamepad analog, _SetupCommand inputs)."""

    vx: jnp.ndarray           # (...,) desired body-frame x velocity
    vy: jnp.ndarray           # (...,)
    yaw_rate: jnp.ndarray     # (...,)
    body_height: jnp.ndarray  # (...,)


class ControllerState(NamedTuple):
    """All mutable state of ConvexMPCLocomotion, as arrays."""

    iteration: jnp.ndarray             # (...,) int32 control-tick counter
    x_vel_des: jnp.ndarray             # (...,) filtered commands
    y_vel_des: jnp.ndarray
    yaw_des: jnp.ndarray
    world_position_desired: jnp.ndarray  # (..., 3)
    rpy_int: jnp.ndarray               # (..., 2) roll/pitch integrators
    rpy_comp: jnp.ndarray              # (..., 2)
    first_swing: jnp.ndarray           # (..., 4) bool
    swing_time_remaining: jnp.ndarray  # (..., 4)
    swing_p0: jnp.ndarray              # (..., 4, 3) swing start
    swing_pf: jnp.ndarray              # (..., 4, 3) swing target
    f_ff: jnp.ndarray                  # (..., 4, 3) current feedforward forces
    fr_des: jnp.ndarray                # (..., 4, 3) MPC forces for WBC
    x_comp_integral: jnp.ndarray       # (...,)
    est: est_ops.EstimatorState
    # previous-solve round-trip data for the disturbance residual
    # (the /log_data self-loop, ConvexMPCLocomotion.cpp:54-56,978-1120)
    prev_x: jnp.ndarray                # (..., 13)
    prev_R: jnp.ndarray                # (..., 3, 3)
    prev_r_feet: jnp.ndarray           # (..., 4, 3)
    prev_x_drag: jnp.ndarray           # (...,)
    have_prev: jnp.ndarray             # (...,) bool
    # ADMM warm-start carry (x, z, y) across MPC steps — successive QPs
    # differ only by one gait-table shift plus state drift, so warm solves
    # need ~4x fewer iterations (qpOASES gets the same effect from its
    # active-set hotstart).  Shapes fixed by the horizon given to
    # init_state; ignored by the PDIP backend.
    warm_x: jnp.ndarray                # (..., 12h)
    warm_z: jnp.ndarray                # (..., 20h)
    warm_y: jnp.ndarray                # (..., 20h)
    warm_kinv: jnp.ndarray             # (..., 12h, 12h) carried K^{-1}


class ControlOutput(NamedTuple):
    """Per-tick controller output (LegController command analog)."""

    f_ff: jnp.ndarray          # (..., 4, 3) world-frame feedforward forces
    fr_des: jnp.ndarray        # (..., 4, 3) MPC reaction forces (for WBC)
    p_foot_des: jnp.ndarray    # (..., 4, 3) desired foot pos, world
    v_foot_des: jnp.ndarray    # (..., 4, 3) desired foot vel, world
    a_foot_des: jnp.ndarray    # (..., 4, 3)
    contact_state: jnp.ndarray # (..., 4) stance progress
    swing_state: jnp.ndarray   # (..., 4) swing progress


def init_state(
    batch: tuple,
    obs: Observation,
    window: int = 400,
    dtype=jnp.float32,
    horizon: int = 10,
    formulation: str = "condensed",
) -> ControllerState:
    """firstRun initialization (ConvexMPCLocomotion.cpp:249-274).

    formulation="stagewise" skips the (12h)^2 carried-K^{-1} buffer (the
    Riccati path refactorizes per solve; only x/z/y warm-carry applies).
    """
    z = lambda *s: jnp.zeros(batch + s, dtype)
    kn = 12 * horizon if formulation == "condensed" else 1
    wpd = jnp.concatenate(
        [obs.p[..., :2], jnp.full(batch + (1,), 0.24, dtype)], axis=-1
    )
    return ControllerState(
        iteration=jnp.zeros(batch, jnp.int32),
        x_vel_des=z(), y_vel_des=z(), yaw_des=z(),
        world_position_desired=wpd,
        rpy_int=z(2), rpy_comp=z(2),
        first_swing=jnp.ones(batch + (4,), bool),
        swing_time_remaining=z(4),
        swing_p0=obs.p_feet.astype(dtype),
        swing_pf=obs.p_feet.astype(dtype),
        f_ff=z(4, 3), fr_des=z(4, 3),
        x_comp_integral=z(),
        est=est_ops.init(batch, window, dtype),
        prev_x=z(13),
        prev_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3)),
        prev_r_feet=z(4, 3),
        prev_x_drag=z(),
        have_prev=jnp.zeros(batch, bool),
        warm_x=z(12 * horizon),
        warm_z=z(20 * horizon),
        warm_y=z(20 * horizon),
        warm_kinv=z(kn, kn),
    )


def setup_command(
    state: ControllerState, cmd: Command, loop: LoopConfig
) -> ControllerState:
    """Velocity-command low-pass (filter = 0.1,
    ConvexMPCLocomotion.cpp:101-123; _yaw_des pinned to 0 as at :120)."""
    f = 0.1
    return state._replace(
        x_vel_des=state.x_vel_des * (1 - f) + cmd.vx * f,
        y_vel_des=state.y_vel_des * (1 - f) + cmd.vy * f,
        yaw_des=jnp.zeros_like(state.yaw_des),
    )


def build_reference_trajectory(
    state: ControllerState,
    obs: Observation,
    cmd: Command,
    v_des_world: jnp.ndarray,
    rpy: jnp.ndarray,
    mpc: MPCConfig,
    loop: LoopConfig,
) -> tuple[jnp.ndarray, ControllerState]:
    """trajAll builder (updateMPCIfNeeded, ConvexMPCLocomotion.cpp:536-586).

    Returns (x_ref (..., h, 13), state with clamped world_position_desired).
    State order matches x: [r, p, yaw, x, y, z, wx, wy, wz, vx, vy, vz, g].
    """
    h = mpc.horizon
    dtype = obs.p.dtype
    max_err = jnp.asarray(loop.max_pos_error, dtype)
    start_xy = jnp.clip(
        state.world_position_desired[..., :2],
        obs.p[..., :2] - max_err,
        obs.p[..., :2] + max_err,
    )
    wpd = jnp.concatenate(
        [start_xy, state.world_position_desired[..., 2:]], axis=-1
    )

    i = jnp.arange(h, dtype=dtype)
    dt_mpc = jnp.asarray(mpc.dt_mpc, dtype)
    batch = obs.p.shape[:-1]

    def tile(v):
        return jnp.broadcast_to(v[..., None], batch + (h,))

    x_ref = jnp.zeros(batch + (h, 13), dtype)
    x_ref = x_ref.at[..., 0].set(tile(state.rpy_comp[..., 0]))
    x_ref = x_ref.at[..., 1].set(tile(state.rpy_comp[..., 1]))
    # yaw: step 0 = current yaw (ConvexMPCLocomotion.cpp:577); steps i>=1
    # accumulate dtMPC * yaw_rate on top of it (:583).
    yaw_steps = rpy[..., 2:3] + i * dt_mpc * cmd.yaw_rate[..., None]
    x_ref = x_ref.at[..., 2].set(yaw_steps)
    x_ref = x_ref.at[..., 3].set(
        start_xy[..., 0:1] + i * dt_mpc * v_des_world[..., 0:1]
    )
    x_ref = x_ref.at[..., 4].set(
        start_xy[..., 1:2] + i * dt_mpc * v_des_world[..., 1:2]
    )
    x_ref = x_ref.at[..., 5].set(tile(cmd.body_height))
    x_ref = x_ref.at[..., 8].set(tile(cmd.yaw_rate))
    x_ref = x_ref.at[..., 9].set(tile(v_des_world[..., 0]))
    x_ref = x_ref.at[..., 10].set(tile(v_des_world[..., 1]))
    return x_ref, state._replace(world_position_desired=wpd)


def mpc_step(
    state: ControllerState,
    obs: Observation,
    cmd: Command,
    gait: gait_ops.GaitParams,
    sim_time: jnp.ndarray,
    mpc: MPCConfig,
    loop: LoopConfig,
    est_cfg: EstimatorConfig,
    solver: ADMMConfig | PDIPConfig,
    ground_truth_z: jnp.ndarray | None = None,
    tunable: TunableParams | None = None,
    return_qp: bool = False,
) -> tuple[ControllerState, jnp.ndarray]:
    """One MPC solve (solveDenseMPC, ConvexMPCLocomotion.cpp:612-870).

    Returns (state', forces (..., h, 4, 3)) — full horizon solution;
    state'.f_ff / .fr_des carry the first-step forces.

    tunable: live-tunable runtime parameters (the dynamic_reconfigure
    tier) — traced, so retuning weights/alpha/mu/f_max/x-drag/EMAs
    between calls reuses the compiled program.

    return_qp (static): also return the assembled problem so callers
    can audit the solve — the condensed QPData (qp_admm.kkt_residuals)
    or, on the stagewise path, the StagewiseProblem
    (qp_stagewise.kkt_residuals).  bench.py and the accuracy tests
    compute KKT residuals of the production warm solution against
    exactly the problem it solved.
    """
    dtype = obs.p.dtype
    R = quat_to_rotmat(obs.quat)
    rpy = quat_to_rpy(obs.quat)
    v_des_robot = jnp.stack(
        [state.x_vel_des, state.y_vel_des, jnp.zeros_like(state.x_vel_des)],
        axis=-1,
    )
    # v_des_world = rBody^T v_des_robot; rBody = R^T (world->body), so this
    # is R @ v_des_robot (ConvexMPCLocomotion.cpp:211,520).
    v_des_world = jnp.einsum("...ij,...j->...i", R, v_des_robot)

    x_ref, state = build_reference_trajectory(
        state, obs, cmd, v_des_world, rpy, mpc, loop
    )

    # r = pFoot - p, with z taken from ground truth when available
    # (solveDenseMPC uses ground_truth_position[2] for p[2],
    # ConvexMPCLocomotion.cpp:628).
    p_used = obs.p
    if ground_truth_z is not None:
        p_used = p_used.at[..., 2].set(ground_truth_z)
    r_feet = obs.p_feet - p_used[..., None, :]

    # x-drag integral (ConvexMPCLocomotion.cpp:813-818, gain = cmpc_x_drag)
    pz_err = p_used[..., 2] - cmd.body_height
    vx = obs.v[..., 0]
    x_drag_gain = (
        jnp.asarray(mpc.x_drag_gain, dtype) if tunable is None
        else tunable.x_drag_gain
    )
    x_comp = state.x_comp_integral + jnp.where(
        jnp.abs(vx) > 0.3,
        x_drag_gain * pz_err * mpc.dt_mpc / jnp.where(vx == 0, 1.0, vx),
        0.0,
    )

    # ---- disturbance residual + periodic estimator ----
    x_k = srb.pack_state(rpy, p_used, obs.omega, obs.v, mpc.gravity)
    # (reference packs x_k(12) = -9.81 here vs -9.8 in the solver; we use
    # the config gravity uniformly)
    if est_cfg.residual == "discrete":
        f_ext = est_ops.residual_discrete(
            x_k, state.prev_x, state.fr_des, state.prev_R,
            state.prev_r_feet, mpc.mass,
            jnp.asarray(mpc.inertia_body, dtype), state.prev_x_drag,
            mpc.dt_mpc,
        )
    else:
        f_ext = est_ops.residual_f_ext(
            x_k, state.prev_x, state.f_ff, state.prev_R, state.prev_r_feet,
            mpc.mass, jnp.asarray(mpc.inertia_body, dtype),
            state.prev_x_drag,
        )
    f_ext = jnp.where(state.have_prev[..., None], f_ext, 0.0)
    est_state, f_for_qp = est_ops.update(
        state.est, sim_time, f_ext, est_cfg,
        ema_smooth=None if tunable is None else tunable.ema_smooth,
        ema_static=None if tunable is None else tunable.ema_static,
    )
    f_steps = None
    if est_cfg.predictive:
        f_steps = est_ops.predict_horizon(
            est_state, sim_time, mpc.dt_mpc, mpc.horizon, est_cfg
        )

    # ---- QP assembly + solve ----
    seg = gait_ops.segment_index(gait, state.iteration, loop.iterations_between_mpc)
    table = gait_ops.mpc_table(gait, seg, mpc.horizon)
    qp_obs = problem.RobotObs(
        p=p_used, v=obs.v, quat=obs.quat, omega=obs.omega, r_feet=r_feet
    )
    if isinstance(solver, ADMMConfig) and solver.formulation == "stagewise":
        # long-horizon path: no condensation, Riccati-ADMM x-update
        import jax

        from quad_periodic_mpc_tpu.ops import constraints, qp_stagewise

        lead = obs.p.shape[:-1]
        h = mpc.horizon
        warm_sw = (
            state.warm_x.reshape(lead + (h, 12)),
            state.warm_z.reshape(lead + (h, 20)),
            state.warm_y.reshape(lead + (h, 20)),
        )
        # Fused-build fast path: the SRB linearization + nilpotent ZOH
        # discretization happen INSIDE the kernel (_kernel_srb) — the
        # XLA build stage's scatter-heavy assembly (~2 ms at batch
        # 2048) disappears.  Requires shared (non-per-instance) cost
        # weights and a time-invariant disturbance term.  return_qp
        # audits KEEP the fused solve and additionally materialize the
        # same problem via build_stagewise, so the published KKT gate
        # audits the actual production dispatch (ADVICE r4).  The
        # kernel is f32-internal, so f64 requests fall back to the XLA
        # stagewise path rather than silently demoting (ADVICE r4).
        use_fused_build = (
            solver.backend == "pallas" and h <= 64
            and f_steps is None and tunable is None
            and dtype == jnp.float32
        )
        if use_fused_build:
            from quad_periodic_mpc_tpu.ops import condense
            from quad_periodic_mpc_tpu.ops.pallas import stagewise_kernel

            x0 = srb.pack_state(rpy, p_used, obs.omega, obs.v, mpc.gravity)
            l, u = constraints.bounds(table, mpc.f_max, mpc.big_number)
            batch = l.shape[:-3]
            l = l.reshape(batch + (h, 20))
            u = jnp.minimum(u, 1e4).reshape(batch + (h, 20))
            F = constraints.pyramid_block(mpc.mu, dtype)
            Qdiag = 2.0 * condense.full_weight(jnp.asarray(mpc.weights, dtype))
            R_eff = (
                2.0 * mpc.alpha * jnp.eye(12, dtype=dtype)
                + solver.rho * jnp.kron(
                    jnp.eye(4, dtype=dtype), jnp.swapaxes(F, -1, -2) @ F
                )
            )
            flat = lambda t, *extra: jnp.broadcast_to(
                t, lead + extra
            ).reshape((-1,) + extra)
            U_f, z_f, y_f = stagewise_kernel.fused_stagewise_solve_srb(
                flat(R, 3, 3), flat(r_feet, 4, 3), flat(x_comp),
                flat(f_for_qp, 6), flat(x0, 13), flat(x_ref, h, 13),
                Qdiag, R_eff, F, flat(l, h, 20), flat(u, h, 20),
                flat(warm_sw[0], h, 12), flat(warm_sw[1], h, 20),
                flat(warm_sw[2], h, 20),
                iters=solver.iterations, rho=float(solver.rho),
                over_relax=float(solver.over_relax),
                ns_it=qp_stagewise.ns_combine_iters(h),
                dt=float(mpc.dt_mpc), mass=float(mpc.mass),
                i_inv_diag=tuple(1.0 / float(v) for v in mpc.inertia_body),
                interpret=jax.default_backend() == "cpu",
            )
            U = U_f.reshape(lead + (h, 12)).astype(dtype)
            info = {
                "z": z_f.reshape(lead + (h, 20)).astype(dtype),
                "y": y_f.reshape(lead + (h, 20)).astype(dtype),
            }
            if return_qp:
                # audit hook: materialize the SAME problem the kernel
                # assembled in-VMEM so kkt_residuals can check the
                # production fused-build solution against it
                sw_audit, _, _ = problem.build_stagewise(
                    qp_obs, x_ref, table, mpc, f_est=f_for_qp,
                    x_drag=x_comp, f_est_steps=f_steps, tunable=tunable,
                )
                qp_out = sw_audit
            else:
                qp_out = None
        else:
            sw, pred, x0 = problem.build_stagewise(
                qp_obs, x_ref, table, mpc, f_est=f_for_qp, x_drag=x_comp,
                f_est_steps=f_steps, tunable=tunable,
            )
            qp_out = sw
            U, info = qp_stagewise.solve(sw, solver, warm=warm_sw)
        state = state._replace(
            warm_x=U.reshape(lead + (mpc.horizon * 12,)),
            warm_z=info["z"].reshape(lead + (mpc.horizon * 20,)),
            warm_y=info["y"].reshape(lead + (mpc.horizon * 20,)),
        )
        u_sol = U.reshape(lead + (mpc.horizon * 12,))
    elif isinstance(solver, ADMMConfig):
        qp, pred, x0 = problem.build_qp(
            qp_obs, x_ref, table, mpc, f_est=f_for_qp, x_drag=x_comp,
            f_est_steps=f_steps, tunable=tunable,
        )
        warm = qp_admm.ADMMState(
            x=state.warm_x, z=state.warm_z, y=state.warm_y,
            kinv=state.warm_kinv,
        )
        qp_out = qp
        u_sol, warm_out = qp_admm.solve(qp, solver, warm=warm)
        state = state._replace(
            warm_x=warm_out.x, warm_z=warm_out.z, warm_y=warm_out.y,
            warm_kinv=warm_out.kinv,
        )
    else:
        qp, pred, x0 = problem.build_qp(
            qp_obs, x_ref, table, mpc, f_est=f_for_qp, x_drag=x_comp,
            f_est_steps=f_steps, tunable=tunable,
        )
        qp_out = qp
        u_sol, _ = qp_pdip.solve(qp, solver)

    forces = u_sol.reshape(u_sol.shape[:-1] + (mpc.horizon, 4, 3))
    f_mpc0 = forces[..., 0, :, :]
    # f_ff = -rBody @ f = -R^T f (ConvexMPCLocomotion.cpp:840)
    f_ff = -jnp.einsum("...ji,...kj->...ki", R, f_mpc0)

    # round-trip data for the next residual (publishLogData analog)
    from quad_periodic_mpc_tpu.ops.rotations import rpy_to_rotmat

    state = state._replace(
        f_ff=f_ff,
        fr_des=f_mpc0,
        x_comp_integral=x_comp,
        est=est_state,
        prev_x=x_k,
        prev_R=rpy_to_rotmat(rpy),
        prev_r_feet=r_feet,
        prev_x_drag=x_comp,
        have_prev=jnp.ones_like(state.have_prev),
    )
    if return_qp:
        return state, forces, qp_out
    return state, forces


def swing_update(
    state: ControllerState,
    obs: Observation,
    cmd: Command,
    gait: gait_ops.GaitParams,
    model: RobotModel,
    swing_cfg: SwingConfig,
    mpc: MPCConfig,
    loop: LoopConfig,
    swing_height,
    tunable: TunableParams | None = None,
    foothold_adjust=None,
) -> tuple[ControllerState, ControlOutput]:
    """Per-control-tick swing/stance bookkeeping + foot targets
    (ConvexMPCLocomotion.cpp:277-460).  Increments the iteration counter.

    tunable overrides swing_height / bonus_swing / p_rel_max live (traced).

    foothold_adjust: optional hook ``(pf_target, state, obs) -> pf`` run on
    the Raibert targets before they are committed as swing goals — the
    terrain tier plugs the elevation-map foothold update here (the call
    site of _updateFoothold inside the _cv driver's swing-leg loop,
    CMPC_Locomotion_cv.cpp:1022).
    """
    if tunable is not None:
        swing_height = tunable.swing_height
    dtype = obs.p.dtype
    R = quat_to_rotmat(obs.quat)
    v_des_robot = jnp.stack(
        [state.x_vel_des, state.y_vel_des, jnp.zeros_like(state.x_vel_des)],
        axis=-1,
    )
    v_des_world = jnp.einsum("...ij,...j->...i", R, v_des_robot)

    ph = gait_ops.phase(gait, state.iteration, loop.iterations_between_mpc)
    contact = gait_ops.contact_state(gait, ph)
    swing_st = gait_ops.swing_state(gait, ph)
    swing_times = gait_ops.swing_time(gait, loop.dt_mpc)
    stance_times = gait_ops.stance_time(gait, loop.dt_mpc)

    # swing timers (ConvexMPCLocomotion.cpp:287-296)
    str_new = jnp.where(
        state.first_swing, swing_times, state.swing_time_remaining - loop.dt
    )

    # Raibert foothold target (updates every tick while swinging)
    hips = jnp.asarray(model.hip_locations(), dtype)
    side = jnp.asarray(model.side_signs(), dtype)
    inter = jnp.asarray(swing_cfg.interleave_y, dtype)
    pf_target = swing.raibert_foothold(
        p_body=obs.p,
        v_world=obs.v,
        v_des_world=v_des_world,
        v_des_robot=v_des_robot,
        R_body=jnp.swapaxes(R, -1, -2),  # rBody = world->body = R^T
        hip_location=jnp.broadcast_to(hips, obs.p_feet.shape),
        side_sign=side,
        abad_link_length=model.leg.abad_link_length,
        yaw_turn_rate=cmd.yaw_rate[..., None],
        stance_time=stance_times,
        swing_time_remaining=str_new,
        body_height_z=obs.p[..., 2],
        interleave_y=inter,
        interleave_gain=swing_cfg.interleave_gain,
        bonus_swing=(
            swing_cfg.bonus_swing if tunable is None else tunable.bonus_swing
        ),
        p_rel_max=(
            swing_cfg.p_rel_max if tunable is None else tunable.p_rel_max
        ),
        dt_mpc=loop.dt_mpc,
    )

    if foothold_adjust is not None:
        pf_target = foothold_adjust(pf_target, state, obs)

    in_swing = swing_st > 0
    # first tick of swing: lock p0 at current foot position
    # (ConvexMPCLocomotion.cpp:376-381)
    start_swing = in_swing & state.first_swing
    p0_new = jnp.where(start_swing[..., None], obs.p_feet, state.swing_p0)
    pf_new = jnp.where(in_swing[..., None], pf_target, state.swing_pf)

    ev = swing.evaluate(
        p0_new, pf_new, swing_height, swing_st, swing_times
    )
    # stance: hold position, zero velocity (ConvexMPCLocomotion.cpp:413-421)
    p_des = jnp.where(in_swing[..., None], ev.p, obs.p_feet)
    v_des = jnp.where(in_swing[..., None], ev.v, 0.0)
    a_des = jnp.where(in_swing[..., None], ev.a, 0.0)

    first_swing_new = jnp.where(in_swing, False, True)  # reset in stance

    # integrate desired world position (ConvexMPCLocomotion.cpp:237-240)
    standing = (gait.durations >= gait.n_segments[..., None]).all(axis=-1)
    wpd = state.world_position_desired + jnp.where(
        standing[..., None], 0.0, loop.dt * v_des_world
    )

    # roll/pitch integral compensation (ConvexMPCLocomotion.cpp:217-230)
    rpy = quat_to_rpy(obs.quat)
    v_robot = obs.v
    rpy_int = state.rpy_int
    rpy_int = rpy_int.at[..., 1].add(
        jnp.where(
            jnp.abs(v_robot[..., 0]) > 0.2,
            loop.dt * (0.0 - rpy[..., 1]) / jnp.where(
                v_robot[..., 0] == 0, 1.0, v_robot[..., 0]
            ),
            0.0,
        )
    )
    rpy_int = rpy_int.at[..., 0].add(
        jnp.where(
            jnp.abs(v_robot[..., 1]) > 0.1,
            loop.dt * (0.0 - rpy[..., 0]) / jnp.where(
                v_robot[..., 1] == 0, 1.0, v_robot[..., 1]
            ),
            0.0,
        )
    )
    rpy_int = jnp.clip(rpy_int, -0.25, 0.25)
    rpy_comp = jnp.stack(
        [v_robot[..., 1] * rpy_int[..., 0], v_robot[..., 0] * rpy_int[..., 1]],
        axis=-1,
    )

    state = state._replace(
        iteration=state.iteration + 1,
        world_position_desired=wpd,
        rpy_int=rpy_int,
        rpy_comp=rpy_comp,
        first_swing=first_swing_new,
        swing_time_remaining=str_new,
        swing_p0=p0_new,
        swing_pf=pf_new,
    )
    out = ControlOutput(
        f_ff=state.f_ff,
        fr_des=state.fr_des,
        p_foot_des=p_des,
        v_foot_des=v_des,
        a_foot_des=a_des,
        contact_state=contact,
        swing_state=swing_st,
    )
    return state, out
